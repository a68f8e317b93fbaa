from .copy import CopyEngine, EmptyTablesError, NoNewDataError  # noqa: F401
from .publish import VersionedCatalog, physical_name, version_of  # noqa: F401
from .scheduler import parse_interval, run_scheduled  # noqa: F401
from .watermark import WatermarkStore, has_new_data, probe_max  # noqa: F401
