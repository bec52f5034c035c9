from tpu_lanczos.graphs.csr import CSRGraph
from tpu_lanczos.graphs import io, generators

__all__ = ["CSRGraph", "io", "generators"]
