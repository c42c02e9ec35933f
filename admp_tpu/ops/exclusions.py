"""Sparse topological-exclusion tables.

The reference stores topological distances in a dense (N, N) int matrix
(reference: admp/parser.py:462-476, admp/api.py:24-42) — a hard memory wall at
scale (100k atoms -> 10^10 entries). Here exclusions are per-atom fixed-width
lists: for each atom, the serials of its <= max_depth bond-graph neighbors and
their distances, padded to a small static width. Pair lookup is a vectorized
match against the row of the first atom — O(width) VPU work per pair, no N^2
storage, jit/shard-friendly.

Both representations are accepted everywhere via :func:`lookup_topology_distance`.
"""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class SparseExclusions:
    """Fixed-width per-atom exclusion table (pytree)."""

    def __init__(self, idx, dist, n_atoms):
        self.idx = idx      # (N, W) int32, padded with N
        self.dist = dist    # (N, W) int32
        self.n_atoms = n_atoms

    def tree_flatten(self):
        return (self.idx, self.dist), self.n_atoms

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    def lookup(self, i, j):
        """Topological distance for pair arrays (i, j); 0 if not excluded.

        idx and dist are packed into one int32 word (idx*16 + dist; distances
        are <= max_depth <= 15) so the per-pair cost is ONE row gather instead
        of two — the pack itself is an O(N*W) elementwise op, negligible next
        to the (P, W) gathers it halves."""
        packed = self.idx * jnp.int32(16) + self.dist.astype(jnp.int32)
        rows = packed[i]                # (P, W)
        match = (rows // 16) == j[..., None]
        return jnp.sum(jnp.where(match, rows % 16, 0), axis=-1)


def build_sparse_exclusions(bonds, n_atoms: int, max_depth: int = 6,
                            width: int | None = None) -> SparseExclusions:
    """BFS the bond graph up to ``max_depth`` into fixed-width per-atom lists."""
    if not 0 <= max_depth <= 15:
        raise ValueError(
            f"max_depth={max_depth} must be <= 15 (distances are packed into "
            "4 bits alongside the neighbor index for single-gather lookup)"
        )
    adj = defaultdict(list)
    for i, j in bonds:
        adj[i].append(j)
        adj[j].append(i)
    rows = []
    for start in range(n_atoms):
        seen = {start: 0}
        queue = deque([start])
        found = []
        while queue:
            cur = queue.popleft()
            d = seen[cur]
            if d >= max_depth:
                continue
            for nxt in adj[cur]:
                if nxt not in seen:
                    seen[nxt] = d + 1
                    found.append((nxt, d + 1))
                    queue.append(nxt)
        rows.append(found)
    max_w = max((len(r) for r in rows), default=0)
    width = max(width or 0, max_w, 1)
    idx = np.full((n_atoms, width), n_atoms, dtype=np.int32)
    dist = np.zeros((n_atoms, width), dtype=np.int32)
    for a, found in enumerate(rows):
        for k, (b, d) in enumerate(found):
            idx[a, k] = b
            dist[a, k] = d
    return SparseExclusions(jnp.asarray(idx), jnp.asarray(dist), n_atoms)


def lookup_topology_distance(covalent, i, j):
    """Uniform pair lookup over dense (N, N) maps or SparseExclusions."""
    if isinstance(covalent, SparseExclusions):
        return covalent.lookup(i, j)
    return covalent[i, j]


def scale_for_distance(scales, nbond):
    """Scale-factor lookup by topological distance, reference-compatible.

    The reference indexes ``mScales[nbond - 1]`` where nbond=0 (non-bonded)
    wraps to the last element and any distance beyond the scale vector clamps
    to the last element via JAX's out-of-bounds gather clamping
    (reference: admp/pairwise.py:73-74) — the convention being that the last
    scale is 1.0 (full strength). A plain ``(nbond - 1) % len`` reproduces the
    wrap but NOT the clamp: distance 6 (present in exclusion tables built with
    max_depth=6, matching the reference's build_covalent_map(data, 6),
    admp/api.py:163) would alias back to mScale12. Clamp explicitly.
    """
    last = scales.shape[0] - 1
    idx = jnp.where(nbond == 0, last, jnp.minimum(nbond - 1, last))
    return scales[idx]


def exclusion_pair_list(covalent, pad_multiple: int = 128):
    """Static (E, 2) int32 list of all topological pairs (i < j, distance > 0),
    padded with [n, n] rows to a multiple of ``pad_multiple``.

    Host-side, O(n_excl): topology is fixed for a run, so the high-accuracy
    float64 exclusion pass (models/pme.py energy_pme) can use a fixed-shape
    pair array independent of the neighbor list.
    """
    if isinstance(covalent, SparseExclusions):
        n = int(covalent.n_atoms)
        idx = np.asarray(covalent.idx)
        dist = np.asarray(covalent.dist)
        a = np.repeat(np.arange(n), idx.shape[1])
        b = idx.reshape(-1)
        d = dist.reshape(-1)
        keep = (d > 0) & (b < n) & (a < b)
        pairs = np.stack([a[keep], b[keep]], axis=1)
    else:
        cm = np.asarray(covalent)
        n = cm.shape[0]
        iu, ju = np.triu_indices(n, k=1)
        keep = cm[iu, ju] > 0
        pairs = np.stack([iu[keep], ju[keep]], axis=1)
    cap = -(-max(len(pairs), 1) // pad_multiple) * pad_multiple
    out = np.full((cap, 2), n, dtype=np.int32)
    out[: len(pairs)] = pairs
    return jnp.asarray(out)
