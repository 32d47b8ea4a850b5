"""Distributed model fitting on Ray Data: deterministic logistic
regression by full-batch gradient descent.

The determinism problem with distributed GD is float summation order:
block-parallel partial gradients arrive in nondeterministic order, so
naive float sums drift run-to-run and no exact parity test (or oracle)
can pin the result.  The fix is the repo's integer-statistics idiom:
each ROW's gradient contribution is quantized to int64 fixed-point
(``scale`` = 2^20) BEFORE summation — integer addition is associative,
so the fold is exact and the trained weights are bit-identical across
block orders, cluster sizes and reruns.  Quantization noise (≤ 2^-20
per row per step) is part of the DEFINED algorithm, not an error term.

Scale plan: one `map_batches` + one tiny Sum-aggregate per iteration
(d+1 int64s per block shuffle); weights broadcast via closure capture
(d+1 floats).  The corpus is re-read per iteration from the
materialized feature table — iterations × one pass, the standard
full-batch GD cost.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa


def logreg_train(ds, feature_cols: Sequence[str], label_col: str,
                 lr: float = 0.5, iters: int = 30,
                 scale: int = 1 << 20) -> "np.ndarray":
    """Train w (len = n_features + 1, bias last) minimizing logistic
    loss over ``ds`` — deterministic by integer-quantized gradient
    folds.  Features are used as-is; standardize upstream if needed.
    Returns the final float64 weight vector."""
    from ray.data.aggregate import Count, Sum

    feats = list(feature_cols)
    d = len(feats)
    tbl = ds.select_columns(feats + [label_col]).materialize()
    n = tbl.count()
    if n == 0:
        raise ValueError("logreg_train: empty input")
    w = np.zeros(d + 1, dtype=np.float64)

    for _ in range(iters):
        w_cap = w.copy()

        def grad(batch: pa.Table, w_cap=w_cap) -> pa.Table:
            x = np.stack([
                batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in feats
            ], axis=1)
            y = batch.column(label_col).to_numpy(
                zero_copy_only=False).astype(np.float64)
            z = x @ w_cap[:d] + w_cap[d]
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y  # dL/dz
            g = np.concatenate([x * err[:, None], err[:, None]], axis=1)
            q = np.round(g * scale).astype(np.int64)  # exact-sum payload
            out = {f"g{j}": pa.array(q[:, j].copy(), pa.int64())
                   for j in range(d + 1)}
            return pa.table(out)

        row = tbl.map_batches(grad, batch_format="pyarrow").aggregate(
            *[Sum(f"g{j}", alias_name=f"s{j}") for j in range(d + 1)]
        )
        gsum = np.array([int(row[f"s{j}"] or 0) for j in range(d + 1)],
                        dtype=np.float64) / scale
        w = w - lr * gsum / n
    return w


def logreg_predict(w: "np.ndarray", x: "np.ndarray") -> "np.ndarray":
    d = len(w) - 1
    return 1.0 / (1.0 + np.exp(-(x @ w[:d] + w[d])))
