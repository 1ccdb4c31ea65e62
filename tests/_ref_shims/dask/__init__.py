"""dask import shim (the reference imports dask but the tested code paths
never touch dask arrays)."""
