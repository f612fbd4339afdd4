from .zarr import ZarrGroup, open_zarr  # noqa: F401
from .etl import (  # noqa: F401
    DataBundle,
    SplitArrays,
    load_ssp_arrays,
    prepare_databundle,
)
