"""Non-parquet sources (SURVEY.md §2.1): sheet-style header-zip ingest
(S8/S9), virtual tables over non-DB backends (S10), and the idempotent
initial-data bootstrap (S12).
"""

from .sheets import read_sheet, sheet_from_rows, sheet_upsert  # noqa: F401
from .virtual import (  # noqa: F401
    catalog_table, files_table, registry_table,
)
from .bootstrap import init_table  # noqa: F401
