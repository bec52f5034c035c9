from tpu_lanczos.core.pipeline import expm_action, LanczosResult
from tpu_lanczos.core.lanczos import lanczos
from tpu_lanczos.core import tridiag, expmv

__all__ = ["expm_action", "LanczosResult", "lanczos", "tridiag", "expmv"]
