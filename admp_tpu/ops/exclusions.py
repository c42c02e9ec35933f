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
        """Topological distance for pair arrays (i, j); 0 if not excluded."""
        rows_idx = self.idx[i]          # (P, W)
        rows_dist = self.dist[i]        # (P, W)
        match = rows_idx == j[..., None]
        return jnp.sum(jnp.where(match, rows_dist, 0), axis=-1)


def build_sparse_exclusions(bonds, n_atoms: int, max_depth: int = 6,
                            width: int | None = None) -> SparseExclusions:
    """BFS the bond graph up to ``max_depth`` into fixed-width per-atom lists."""
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
