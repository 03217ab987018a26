from .staging import stg_green_tripdata, stg_yellow_tripdata, STAGING_COLUMNS  # noqa: F401
from .core import dim_zones, fact_trips, dm_monthly_zone_revenue, dm_monthly_zone_statistics  # noqa: F401
from .runner import Model, PipelineRunner  # noqa: F401
