"""Independent NumPy replay of ``graphsage_train(rng='portable')``.

This is the oracle for the ``graphsage_train_replay`` registry row: a
from-scratch reimplementation of the trainer's semantics (reference
``GraphSageModelTrainer.java:62`` / ``GraphSageLoss.java:35`` /
``BatchSampler.java:51``, in the engine's documented synchronous
full-batch form) using ONLY hashlib + random + NumPy — no Spark. The
portable md5 draw stream makes every sample (walk steps, walk depths,
negative draws, layer sampling) reproducible here bit-for-bit; float
sums may differ from Spark's aggregation order by ~1e-13, which the e6
phase-floor absorbs.

Run ``python tools/graphsage_replay.py`` to print the golden rows used
by ``queries_ext24.Q_GRAPHSAGE_TRAIN_SQL`` (and regenerate them if the
fixture or parameters change).
"""

from __future__ import annotations

import hashlib
import math
import random

import numpy as np

H_SPAN = float(16**15)
PHASE = 0.3183098861837907  # 1/π — same comparison contract as queries._e


def phash(*parts) -> int:
    payload = ":".join(str(int(p)) if not isinstance(p, str) else p for p in parts)
    return int(hashlib.md5(payload.encode()).hexdigest()[:15], 16)


def _xavier(rng: random.Random, n_out: int, n_in: int):
    bound = (6.0 / (n_in + n_out)) ** 0.5
    return np.array([[rng.uniform(-bound, bound) for _ in range(n_in)] for _ in range(n_out)])


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def replay(
    edges: list,
    features: dict,
    embedding_dim: int = 16,
    sample_sizes: list | None = None,
    epochs: int = 10,
    learning_rate: float = 0.1,
    tolerance: float = 1e-4,
    search_depth: int = 5,
    negative_sample_weight: int = 20,
    penalty_l2: float = 0.0,
    random_seed: int = 42,
):
    """edges: [(src, dst)] directed; features: {node_id: [floats]}.
    Returns {"losses": [...], "weights": [np (out×in) per layer],
    "ran_steps": int, "did_converge": bool}."""
    if sample_sizes is None:
        sample_sizes = [25, 10]
    n_layers = len(sample_sizes)
    seed = int(random_seed)
    Q = float(negative_sample_weight)
    nodes = sorted(features)
    n_nodes = len(nodes)
    feat_dim = len(next(iter(features.values())))

    out_adj: dict = {}
    for s, d in edges:
        out_adj.setdefault(s, []).append(d)

    # degree^0.75 inverse-CDF (node_id-ascending cumulative intervals)
    w = {u: float(len(out_adj.get(u, ()))) ** 0.75 for u in nodes}
    total_w = float(sum(w[u] for u in nodes))
    if not total_w:
        raise ValueError("no edges")
    intervals = []  # (lo, hi, node), node-id order
    acc = 0.0
    for u in nodes:
        if w[u] > 0:
            intervals.append((acc, acc + w[u], u))
        acc += w[u]

    def draw_negative(r: float) -> int:
        for lo, hi, u in intervals:
            if lo <= r < hi:
                return u
        return intervals[-1][2]  # r == total_w edge; cannot happen for r < total

    # per-layer sampled edges: per src, the sample_size smallest
    # md5(src, dst, seed, layer) draws
    layer_adj = []
    for k in range(n_layers):
        adj_k = {}
        for u, ds in out_adj.items():
            ranked = sorted(ds, key=lambda d: phash(u, d, seed, k))
            adj_k[u] = ranked[: int(sample_sizes[k])]
        layer_adj.append(adj_k)

    rng = random.Random(seed)
    dims = [feat_dim] + [int(embedding_dim)] * n_layers
    weights = [_xavier(rng, dims[k + 1], dims[k]) for k in range(n_layers)]
    adam_m = [np.zeros_like(weights[k]) for k in range(n_layers)]
    adam_v = [np.zeros_like(weights[k]) for k in range(n_layers)]
    beta1, beta2, eps = 0.9, 0.999, 1e-8

    feats = {u: np.asarray(features[u], dtype=np.float64) for u in nodes}
    losses = []
    did_converge = False
    step = 0
    for step in range(1, int(epochs) + 1):
        # positives: seeded walk, per-u depth in [1, search_depth]
        depth = {u: phash(u, seed, step, "d") % search_depth + 1 for u in nodes}
        cur = {u: u for u in nodes}
        for walk_step in range(1, int(search_depth) + 1):
            for u in nodes:
                if depth[u] >= walk_step:
                    cands = out_adj.get(cur[u], ())
                    if cands:
                        cur[u] = min(cands, key=lambda d: phash(u, d, seed, step, walk_step))
        positives = {u: cur[u] for u in nodes}
        negatives = {
            u: draw_negative(phash(u, seed, step, "n") / H_SPAN * total_w) for u in nodes
        }

        # forward, keeping per-layer m (pooled mean) and activation
        h = dict(feats)
        inter = []  # per layer: (m, emb) dicts
        for k in range(n_layers):
            m = {}
            for u in nodes:
                vecs = [h[u]] + [h[v] for v in layer_adj[k].get(u, ())]
                m[u] = np.mean(vecs, axis=0)
            emb = {u: _sigmoid(weights[k] @ m[u]) for u in nodes}
            inter.append((m, emb))
            h = emb

        r_norm = {u: float(np.linalg.norm(h[u])) for u in nodes}
        z = {u: (h[u] / r_norm[u] if r_norm[u] > 0 else h[u]) for u in nodes}

        # loss + dz
        loss_sum = 0.0
        dz: dict = {}
        for u in nodes:
            for other, is_pos in ((positives[u], True), (negatives[u], False)):
                s = float(np.dot(z[u], z[other]))
                if is_pos:
                    coeff = -1.0 / (1.0 + math.exp(s)) / n_nodes
                    loss_sum += -math.log(1.0 / (1.0 + math.exp(-s)))
                else:
                    coeff = Q / (1.0 + math.exp(-s)) / n_nodes
                    loss_sum += -Q * math.log(1.0 / (1.0 + math.exp(s)))
                dz[u] = dz.get(u, 0.0) + z[other] * coeff
                dz[other] = dz.get(other, 0.0) + z[u] * coeff
        losses.append(loss_sum / n_nodes)

        # backward through the L2 normalize (only nodes with dz)
        dh = {}
        for u, g in dz.items():
            if r_norm[u] > 0:
                dh[u] = (g - z[u] * float(np.dot(z[u], g))) / r_norm[u]
            else:
                dh[u] = np.zeros_like(g)

        grads = [None] * n_layers
        for k in range(n_layers - 1, -1, -1):
            m_k, emb_k = inter[k]
            dpre = {u: g * emb_k[u] * (1.0 - emb_k[u]) for u, g in dh.items()}
            gW = np.zeros_like(weights[k])
            for u, dp in dpre.items():
                gW += np.outer(dp, m_k[u])
            grads[k] = gW
            if k > 0:
                dmn = {}
                for u, dp in dpre.items():
                    cnt = 1 + len(layer_adj[k].get(u, ()))
                    dmn[u] = (weights[k].T @ dp) / cnt
                nxt: dict = {}
                for u, g in dmn.items():
                    nxt[u] = nxt.get(u, 0.0) + g  # self term
                    for v in layer_adj[k].get(u, ()):
                        nxt[v] = nxt.get(v, 0.0) + g  # reverse gather
                dh = nxt

        for k in range(n_layers):
            g = grads[k] + penalty_l2 * weights[k]
            adam_m[k] = beta1 * adam_m[k] + (1 - beta1) * g
            adam_v[k] = beta2 * adam_v[k] + (1 - beta2) * g * g
            mhat = adam_m[k] / (1 - beta1**step)
            vhat = adam_v[k] / (1 - beta2**step)
            weights[k] = weights[k] - learning_rate * mhat / (np.sqrt(vhat) + eps)

        if len(losses) >= 2 and abs(losses[-1] - losses[-2]) < tolerance:
            did_converge = True
            break

    return {
        "losses": losses,
        "weights": weights,
        "ran_steps": step,
        "did_converge": did_converge,
    }


# --------------------------------------------------------------------------
# Fixture + golden generation (nation cliques — identical at every TPC-H
# scale factor, so the goldens are sf-independent)
# --------------------------------------------------------------------------

FIXTURE_PARAMS = dict(
    embedding_dim=4,
    sample_sizes=[10],
    epochs=4,
    learning_rate=0.1,
    tolerance=1e-6,
    search_depth=3,
    negative_sample_weight=20,
    random_seed=11,
)


def nation_fixture(sf_dir: str = "/root/testdata/sf0.01"):
    """Undirected nation-clique edges (node id 10 + n_nationkey) and
    2-dim features — the same derivation queries_ext24 builds in Spark."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/nation.parquet").to_pydict()
    keys = t["n_nationkey"]
    regions = t["n_regionkey"]
    by_region: dict = {}
    for nk, rk in zip(keys, regions):
        by_region.setdefault(rk, []).append(10 + int(nk))
    edges = []
    for members in by_region.values():
        for a in members:
            for b in members:
                if a != b:
                    edges.append((a, b))
    features = {
        10 + int(nk): [1.0 + (int(nk) % 3), 0.5 * (int(rk) + 1)]
        for nk, rk in zip(keys, regions)
    }
    return edges, features


def golden_rows(sf_dir: str = "/root/testdata/sf0.01"):
    edges, features = nation_fixture(sf_dir)
    res = replay(edges, features, **FIXTURE_PARAMS)
    rows = []
    for i, loss in enumerate(res["losses"], start=1):
        rows.append(("loss", i, math.floor(loss * 1e6 + PHASE)))
    for k, wm in enumerate(res["weights"]):
        out_d, in_d = wm.shape
        for i in range(out_d):
            for j in range(in_d):
                rows.append((f"w{k}", i * in_d + j, math.floor(wm[i, j] * 1e6 + PHASE)))
    return rows


if __name__ == "__main__":
    for kind, idx, v in golden_rows():
        print(f"    (\"{kind}\", {idx}, {v}),")
