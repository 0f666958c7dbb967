"""Retrieval/copy-detection evaluation utilities
(ref examples/evaluate_copy_detection.py, evaluate_image_retrieval.py).

Pure-JAX/numpy building blocks: GeM pooling, PCA whitening, cosine top-k,
and the revisited-Oxford/Paris style AP/mAP with junk handling. Feature
extraction over a dataset runs as a jitted batched forward on the mesh
(XLA's all-gather replaces the reference's hand-rolled async
``dist.all_gather`` + rank-0 ``index_copy_``, ref evaluate_copy_detection.py:
310-339).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gem_pool",
    "PCAWhitening",
    "cosine_topk",
    "compute_ap",
    "compute_map",
    "extract_features",
    "CopydaysBlocks",
    "copydays_eval",
]


def gem_pool(tokens: jax.Array, p: float = 4.0, eps: float = 1e-6) -> jax.Array:
    """Generalized-mean pooling over the token axis
    (ref evaluate_copy_detection.py:294-308: CLS ⊕ GeM₄(patch tokens))."""
    x = jnp.clip(tokens, eps, None) ** p
    return jnp.mean(x, axis=-2) ** (1.0 / p)


class PCAWhitening:
    """PCA + whitening learned on a training feature matrix
    (ref evaluate_copy_detection.py:30-84)."""

    def __init__(self, dim: int = 256, whit: float = 0.5):
        self.dim = dim
        self.whit = whit
        self.mean = None
        self.proj = None

    def train(self, X: np.ndarray) -> "PCAWhitening":
        X = np.asarray(X, np.float64)
        self.mean = X.mean(axis=0)
        Xc = X - self.mean
        cov = Xc.T @ Xc / len(X)
        eigval, eigvec = np.linalg.eigh(cov)
        order = np.argsort(eigval)[::-1][: self.dim]
        eigval, eigvec = np.clip(eigval[order], 1e-12, None), eigvec[:, order]
        self.proj = eigvec * (eigval ** -self.whit)
        return self

    def apply(self, X: np.ndarray) -> np.ndarray:
        return (np.asarray(X, np.float64) - self.mean) @ self.proj


def cosine_topk(queries: np.ndarray, database: np.ndarray, k: int = 20):
    """L2-normalize both sides, return (scores, indices) of the top-k
    database entries per query (ref evaluate_copy_detection.py:497-508)."""
    q = queries / np.clip(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12, None)
    d = database / np.clip(np.linalg.norm(database, axis=1, keepdims=True), 1e-12, None)
    sim = q @ d.T
    idx = np.argsort(-sim, axis=1)[:, :k]
    return np.take_along_axis(sim, idx, axis=1), idx


def compute_ap(ranks: np.ndarray, nres: int) -> float:
    """Average precision given 0-indexed ranks of positives
    (ref evaluate_image_retrieval.py:96-130)."""
    if nres == 0:
        return 0.0
    ap = 0.0
    recall_step = 1.0 / nres
    for j, rank in enumerate(ranks):
        precision_0 = j / rank if rank > 0 else 1.0
        precision_1 = (j + 1) / (rank + 1)
        ap += (precision_0 + precision_1) * recall_step / 2.0
    return ap


def compute_map(ranks: np.ndarray, gnd: list[dict], kappas=()):
    """mAP with junk handling + precision@k
    (ref evaluate_image_retrieval.py:133-200). ``ranks`` is
    [num_db, num_queries] (ranked db indices per query); ``gnd[i]`` has
    'ok' (positives) and optional 'junk' arrays."""
    mAP = 0.0
    nq = len(gnd)
    aps = np.zeros(nq)
    prs = np.zeros((nq, len(kappas)))
    nempty = 0
    for i in range(nq):
        qgnd = np.asarray(gnd[i]["ok"])
        if qgnd.size == 0:
            aps[i] = float("nan")
            prs[i] = float("nan")
            nempty += 1
            continue
        qgndj = np.asarray(gnd[i].get("junk", []))
        pos = np.isin(ranks[:, i], qgnd).nonzero()[0]
        junk = np.isin(ranks[:, i], qgndj).nonzero()[0]
        if junk.size:
            # shift positive ranks down past preceding junk
            ip = 0
            ij = 0
            shift = np.zeros(len(pos))
            while ip < len(pos):
                while ij < len(junk) and pos[ip] > junk[ij]:
                    ij += 1
                shift[ip] = ij
                ip += 1
            pos = pos - shift
        ap = compute_ap(pos, len(qgnd))
        mAP += ap
        aps[i] = ap
        for j, kappa in enumerate(kappas):
            kq = min(max(len(pos), 1), kappa)
            prs[i, j] = (pos < kappa).sum() / kq
    mAP = mAP / max(nq - nempty, 1)
    return mAP, aps, prs.mean(axis=0) if len(kappas) else None


class CopydaysBlocks:
    """INRIA Copydays on-disk protocol (ref evaluate_copy_detection.py:153-181):
    per-distortion query blocks (``original``, ``strong``, ``jpegqual/Q``,
    ``crops/C``), database = the ``original`` block (+distractors appended by
    the caller). Block sizes derive from the actual listings (157/229 on the
    real dataset — the reference hardcodes those; deriving is the intent)."""

    BLOCK_NAMES = (
        ["original", "strong"]
        + ["jpegqual/%d" % i for i in [3, 5, 8, 10, 15, 20, 30, 50, 75]]
        + ["crops/%d" % i for i in [10, 15, 20, 30, 40, 50, 60, 70, 80]]
    )

    def __init__(self, basedir):
        from pathlib import Path

        self.basedir = Path(basedir)
        self.block_names = [
            b for b in self.BLOCK_NAMES if (self.basedir / b).is_dir()
        ]
        if "original" not in self.block_names:
            raise FileNotFoundError(f"no original/ block under {basedir}")

    def block_files(self, name: str) -> list:
        d = self.basedir / name
        return sorted(p for p in d.iterdir() if p.suffix.lower() == ".jpg")


def copydays_eval(
    ids: np.ndarray,
    block_names: list[str],
    block_sizes: list[int],
    original_names: list[str],
    strong_names: list[str] | None = None,
) -> dict[str, float]:
    """Per-distortion-block mAP over concatenated query blocks
    (ref evaluate_copy_detection.py:184-211 ``eval_result``).

    ``ids``: [num_queries_total, k] ranked database indices (database order =
    originals first, distractors after — distractor hits are negatives by
    construction). Every non-``strong`` block maps query j → positive {j}
    (same sorted order as originals); ``strong`` queries match originals by
    4-char filename prefix (ref :193-201).
    """
    out = {}
    j0 = 0
    for name, size in zip(block_names, block_sizes):
        block_ids = ids[j0 : j0 + size]
        if name != "strong":
            positives_per_query = [[q] for q in range(size)]
        else:
            positives_per_query = [
                [j for j, bname in enumerate(original_names)
                 if bname[:4] == qname[:4]]
                for qname in (strong_names or [])
            ]
        sum_ap = 0.0
        for qno, row in enumerate(block_ids):
            positives = positives_per_query[qno]
            ranks = [rank for rank, bno in enumerate(row) if bno in positives]
            sum_ap += compute_ap(np.asarray(ranks), len(positives))
        out[name] = sum_ap / max(size, 1)
        j0 += size
    return out


def extract_features(apply_fn, loader, mesh=None) -> tuple[np.ndarray, np.ndarray]:
    """Run ``apply_fn(images) -> features`` over a loader, returning the full
    (features, indices) matrices on host in dataset order (the reference's
    distributed extract + gather, ref evaluate_copy_detection.py:272-339).

    Batches are prefetched to device (2-deep; sharded over the mesh's
    ``data`` axis when ``mesh`` is given — XLA's all-gather replaces the
    reference's async ``dist.all_gather``) and feature outputs stay on
    device until one final bulk fetch, so compute, H2D and D2H all overlap.
    """
    from .parallel import batch_sharding, replicated
    from .train.data import prefetch_to_device

    if mesh is not None:
        in_sharding = batch_sharding(mesh)
        jitted = jax.jit(apply_fn, out_shardings=replicated(mesh))
    else:
        in_sharding = None
        jitted = jax.jit(apply_fn)

    feats, idxs = [], []
    if in_sharding is not None:
        batches = prefetch_to_device(
            ({"image": b["image"]} for b in _tee_indices(loader, idxs)),
            in_sharding,
        )
        for device_batch in batches:
            feats.append(jitted(device_batch["image"]))
    else:
        for batch in loader:
            idxs.append(np.asarray(batch["index"]))
            feats.append(jitted(jnp.asarray(batch["image"])))
    feats = np.concatenate([np.asarray(f) for f in jax.device_get(feats)])
    idxs = np.concatenate(idxs)
    order = np.argsort(idxs)
    return feats[order], idxs[order]


def _tee_indices(loader, idxs_out: list):
    """Yield batches while appending their host-side indices to ``idxs_out``."""
    for batch in loader:
        idxs_out.append(np.asarray(batch["index"]))
        yield batch
