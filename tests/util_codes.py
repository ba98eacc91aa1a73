"""Small random LDPC constructions for tests (no reference data needed)."""

import numpy as np


def random_regular_H(nvar: int, dv: int, dc: int, seed: int = 0) -> np.ndarray:
    """Configuration-model (dv, dc)-regular parity matrix without repeated
    edges; rejects and re-permutes until simple."""
    assert (nvar * dv) % dc == 0
    nchk = nvar * dv // dc
    rng = np.random.default_rng(seed)
    var_sockets = np.repeat(np.arange(nvar), dv)
    chk_sockets = np.repeat(np.arange(nchk), dc)
    for _ in range(1000):
        perm = rng.permutation(len(var_sockets))
        pairs = set(zip(var_sockets.tolist(), chk_sockets[perm].tolist()))
        if len(pairs) == len(var_sockets):
            H = np.zeros((nchk, nvar), dtype=np.uint8)
            for v, c in pairs:
                H[c, v] = 1
            return H
    raise RuntimeError("failed to build a simple regular graph")
