from tpu_lanczos.kernels.formats import DeviceGraph, pack
from tpu_lanczos.kernels.spmv import spmv

__all__ = ["DeviceGraph", "pack", "spmv"]
