from .core import (  # noqa: F401
    add_object_key, apply_generators, gen_time_sortable_id, iso_now,
    json_parse, mask_secret, password_hash, path_prefixes, rename_columns,
    sanitize_key, split_column, join_array, to_json_pretty, uuid4_column,
    uuid_validate, uuid_version)
