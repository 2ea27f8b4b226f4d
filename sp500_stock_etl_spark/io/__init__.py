from .readers import load_table, load_tables, read_stock_csv  # noqa: F401
from .writers import write_quoted_csv  # noqa: F401
