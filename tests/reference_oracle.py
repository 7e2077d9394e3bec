"""Pure-numpy float64 oracle reproducing the reference embedder's step
semantics exactly (reference NewWEmbedEmbedder.cpp:14-92,188-256 and
AdamOptimizer.cpp:18-34), with the ideal (exhaustive) repulsion candidate
set.  Used to validate the jitted TPU step per-iteration: identical inputs
must produce identical trajectories (SURVEY.md M1 parity gate)."""

from __future__ import annotations

import numpy as np

from wembed_tpu.core.options import EmbedderOptions
from wembed_tpu.graphs.csr import CSRGraph


class OracleAdam:
    def __init__(self, n, d, lr, cooling, b1=0.9, b2=0.999, eps=1e-8):
        self.m = np.zeros((n, d))
        self.v = np.zeros((n, d))
        self.t = 0
        self.lr, self.cooling, self.b1, self.b2, self.eps = lr, cooling, b1, b2, eps

    def update(self, params, grads):
        self.t += 1
        cooling = self.cooling**self.t
        self.m = self.b1 * self.m + (1 - self.b1) * grads
        self.v = self.b2 * self.v + (1 - self.b2) * grads * grads
        m_hat = self.m / (1 - self.b1**self.t)
        v_hat = self.v / (1 - self.b2**self.t)
        return params + cooling * self.lr * m_hat / (np.sqrt(v_hat) + self.eps)


def oracle_step(pos, weights, g: CSRGraph, opts: EmbedderOptions, adam: OracleAdam):
    """One reference step.  Returns (new_pos, att_loss, rep_loss, pos_change).
    Assumes no coincident points (the random-kick path is tested separately).
    """
    n, d = pos.shape
    L = opts.edge_length
    inv_w = weights ** (-1.0 / d)
    force = np.zeros_like(pos)
    att_loss = 0.0
    rep_loss = 0.0

    def ws_of(v, u):
        if opts.additive_weights:
            return inv_w[v] + inv_w[u]
        return inv_w[v] * inv_w[u]

    for v in range(n):
        for u in g.neighbors(v):
            diff = pos[u] - pos[v]
            dist = np.linalg.norm(diff)
            assert dist > 0, "oracle does not model coincident points"
            ws = ws_of(v, u)
            if dist * ws > L:
                force[v] += opts.attraction_scale * ws * diff / dist
                att_loss += dist - L / ws
    for v in range(n):
        for u in range(n):
            if u == v or g.are_neighbors(v, u) or g.same_color(v, u):
                continue
            diff = pos[v] - pos[u]
            dist = np.linalg.norm(diff)
            assert dist > 0
            ws = ws_of(v, u)
            if dist * ws <= L:
                force[v] += opts.repulsion_scale * ws * diff / dist
                rep_loss += L / ws - dist

    if opts.centre_scale != 0.0:
        force += -opts.centre_scale * pos

    new_pos = adam.update(pos.copy(), force)
    new_pos = new_pos - new_pos.mean(axis=0, keepdims=True)
    pos_change = float(((pos - new_pos) ** 2).sum() / n)
    return new_pos, att_loss, rep_loss, pos_change
