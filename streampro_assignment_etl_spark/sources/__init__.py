from .testdata import TESTDATA_TABLES, load_tables, register_views  # noqa: F401
