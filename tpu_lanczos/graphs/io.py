"""MatrixMarket-style .mtx reading/writing with the reference's semantics.

Format (reference: parallel-final/lib/adjMatrix.cc:21-46, write path :53-69):
  - optional comment lines starting with '%'
  - a header line ``n n E``
  - E data lines of two 1-indexed node ids per line (extra columns, e.g. a
    weight in general MatrixMarket files, are ignored)
  - on read, both orientations are inserted and duplicates removed
  - on write, only the upper triangle is emitted, 1-indexed

When available the native C++ parser (:mod:`tpu_lanczos.graphs.native`) is
used for large files; the numpy path below is the portable fallback and the
semantics oracle.
"""

from __future__ import annotations

import io as _io
import os

import numpy as np

from tpu_lanczos.graphs.csr import CSRGraph


def _read_tokens(path: str) -> tuple[int, int, np.ndarray]:
    """Returns (n, declared_edges, (E,2) 0-indexed edge array)."""
    with open(path, "rb") as f:
        data = f.read()
    # strip comment lines
    lines = data.split(b"\n")
    body_start = 0
    for i, ln in enumerate(lines):
        if not ln.strip() or ln.lstrip().startswith(b"%"):
            continue
        body_start = i
        break
    header = lines[body_start].split()
    n = int(header[0])
    n2 = int(header[1])
    if n != n2:
        raise ValueError(f"adjacency matrix must be square, got {n}x{n2}")
    declared_e = int(header[2])
    body = b"\n".join(lines[body_start + 1 :])
    arr = np.array(body.split(), dtype=np.float64)
    if arr.size == 0:
        return n, declared_e, np.zeros((0, 2), dtype=np.int64)
    # lines may carry 2 or 3 tokens (pattern vs weighted mtx); infer width
    if arr.size % 3 == 0 and declared_e * 3 == arr.size:
        arr = arr.reshape(-1, 3)[:, :2]
    elif arr.size % 2 == 0 and declared_e * 2 == arr.size:
        arr = arr.reshape(-1, 2)
    else:
        # fall back: assume 2 columns
        arr = arr[: (arr.size // 2) * 2].reshape(-1, 2)
    edges = arr.astype(np.int64) - 1  # 1-indexed on disk
    return n, declared_e, edges


def read_mtx(path: str, use_native: bool = True) -> CSRGraph:
    """Read a .mtx adjacency file into a value-free CSR graph.

    Matches the reference's reader semantics (1-indexed pairs, symmetrize,
    dedup, self-loops dropped; parallel-final/lib/adjMatrix.cc:21-46).
    """
    if use_native:
        try:
            from tpu_lanczos.graphs import native

            if native.available():
                return native.read_mtx(path)
        except Exception:
            pass
    n, _, edges = _read_tokens(path)
    return CSRGraph.from_edges(n, edges)


def write_mtx(graph: CSRGraph, path: str) -> None:
    """Write the upper triangle, 1-indexed, with an ``n n E`` header
    (reference: parallel-final/lib/adjMatrix.cc:53-69)."""
    rows = graph.row_ids().astype(np.int64)
    cols = graph.indices.astype(np.int64)
    keep = rows < cols
    rows, cols = rows[keep], cols[keep]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    buf = _io.StringIO()
    buf.write(f"{graph.n} {graph.n} {rows.size}\n")
    np.savetxt(buf, np.stack([rows + 1, cols + 1], axis=1), fmt="%d %d")
    with open(path, "w") as f:
        f.write(buf.getvalue())
