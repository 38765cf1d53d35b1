"""DeepFraudNet-parity scoring via predict_batch_udf (reference ML1/M9).

The reference scores with a PyTorch MLP (11->256->128->64->1, BatchNorm +
ReLU + Dropout, sigmoid head; ``model/training.py:33-54``) in a driver-side
512-row loop (``featurestore_flow.py:96-103``). The engine-native form is
``pyspark.ml.functions.predict_batch_udf``: Arrow-batched, executor-side,
one narrow stage over the feature DataFrame.

torch is not installed in this container, so the forward pass is a numpy
implementation of the SAME architecture in eval mode (BatchNorm folds into
an affine transform; Dropout is identity at inference). ``load_weights``
accepts a dict of numpy arrays — export a trained torch state_dict to npz
and this path serves it unchanged; the harness uses deterministic
seed-generated weights to exercise the plumbing.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

DEEPFRAUDNET_LAYERS = [11, 256, 128, 64]  # hidden stack; head is 1 sigmoid


def init_weights(n_features: int = 11, seed: int = 42) -> dict[str, np.ndarray]:
    """Deterministic stand-in weights with the DeepFraudNet shapes."""
    rng = np.random.default_rng(seed)
    sizes = [n_features, *DEEPFRAUDNET_LAYERS[1:], 1]
    weights: dict[str, np.ndarray] = {}
    for i in range(len(sizes) - 1):
        fan_in, fan_out = sizes[i], sizes[i + 1]
        weights[f"w{i}"] = rng.normal(0, np.sqrt(2.0 / fan_in), (fan_in, fan_out))
        weights[f"b{i}"] = np.zeros(fan_out)
        if i < len(sizes) - 2:  # BatchNorm per hidden block (eval: affine)
            weights[f"bn_scale{i}"] = np.ones(fan_out)
            weights[f"bn_shift{i}"] = np.zeros(fan_out)
    return weights


def forward(x: np.ndarray, weights: dict[str, np.ndarray]) -> np.ndarray:
    """Eval-mode forward pass: Linear -> BN(affine) -> ReLU per block,
    Linear -> sigmoid head. Dropout is identity at inference."""
    h = x.astype(np.float64)
    n_blocks = len(DEEPFRAUDNET_LAYERS) - 1
    for i in range(n_blocks):
        h = h @ weights[f"w{i}"] + weights[f"b{i}"]
        h = h * weights[f"bn_scale{i}"] + weights[f"bn_shift{i}"]
        h = np.maximum(h, 0.0)
    logits = h @ weights[f"w{n_blocks}"] + weights[f"b{n_blocks}"]
    return 1.0 / (1.0 + np.exp(-logits[:, 0]))


def make_predict_fn(
    weights: dict[str, np.ndarray],
) -> Callable[[], Callable[[np.ndarray], np.ndarray]]:
    """Factory for predict_batch_udf: the returned maker runs once per
    executor (weights deserialize once, not per batch)."""

    def maker() -> Callable[[np.ndarray], np.ndarray]:
        w = weights  # closed over; broadcast with the serialized udf

        def predict(batch: np.ndarray) -> np.ndarray:
            return forward(batch, w)

        return predict

    return maker


def score_dataframe(features_df, feature_cols: list[str], weights=None):
    """Score a feature DataFrame with the MLP via predict_batch_udf —
    Arrow batches executor-side, no driver loop (replaces reference M9)."""
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    weights = weights or init_weights(n_features=len(feature_cols))
    udf = predict_batch_udf(
        make_predict_fn(weights),
        return_type=DoubleType(),
        batch_size=512,  # reference batch size, training.py:18
        input_tensor_shapes=[[len(feature_cols)]],
    )
    arr = F.array(*[F.col(c).cast("double") for c in feature_cols])
    return features_df.withColumn("fraud_prob", udf(arr))
