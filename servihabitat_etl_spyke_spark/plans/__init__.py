from .listquery import ListParams, list_query, list_page, group_options, parse_search  # noqa: F401
