"""zarr import shim: the reference only needs ``zarr.Array`` for isinstance
checks in code paths the tests never take (numpy volumes are used)."""


class Array:
    pass


def open(*args, **kwargs):
    raise NotImplementedError("zarr shim: not available in this environment")
