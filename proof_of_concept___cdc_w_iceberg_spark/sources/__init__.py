from .tables import TABLES, load, register_views  # noqa: F401
