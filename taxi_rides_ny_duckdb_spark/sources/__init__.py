from .registry import TESTDATA_TABLES, load, register_all  # noqa: F401
from .seeds import load_seed_csv  # noqa: F401
