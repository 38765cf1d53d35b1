"""Environment-gated seams: these tests activate AUTOMATICALLY the day
the container grows the blocked dependency (a codec library, torch) —
importorskip keeps them cleanly skipped until then, so coverage turns on
without a round of code changes.

Today's container has neither PIL nor torch; both tests skip. The
always-on halves of these seams (NotImplementedError dispatch, npz
state-dict import) are pinned in test_multimodal / test_ann_and_scoring.
"""

from __future__ import annotations

import numpy as np
import pytest


def test_decode_image_features_with_real_codec(spark):
    """With PIL present, decode_image dispatches to it and the
    mapInPandas operator yields true (width, height, mode) rows."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    rows = []
    for doc_id, (w, h) in enumerate([(3, 2), (5, 7), (1, 1)]):
        img = PIL_Image.new("RGB", (w, h), color=(doc_id, 0, 0))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        rows.append((doc_id, bytearray(buf.getvalue())))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    from feature_store_fraud_detection_spark.operators.multimodal import (
        decode_image_features,
    )

    got = {
        r.doc_id: (r.width, r.height, r.mode)
        for r in decode_image_features(df).collect()
    }
    assert got == {0: (3, 2, "RGB"), 1: (5, 7, "RGB"), 2: (1, 1, "RGB")}


def test_torch_state_dict_roundtrip_scores_match_torch_eval(tmp_path):
    """With torch present, a trained-in-torch model exported the
    documented way (np.savez of state_dict tensors) must load through
    load_weights/from_state_dict_arrays and score bit-close to torch's
    own eval-mode forward (the BN fold is exact in float64)."""
    torch = pytest.importorskip("torch")
    nn = torch.nn

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.Sequential(
                nn.Linear(4, 8),
                nn.BatchNorm1d(8),
                nn.ReLU(),
                nn.Dropout(0.3),
                nn.Linear(8, 1),
                nn.Sigmoid(),
            )

        def forward(self, x):
            return self.model(x)

    torch.manual_seed(11)
    net = Net().double()
    # a few training steps so BN running stats are non-trivial
    opt = torch.optim.SGD(net.parameters(), lr=0.05)
    x = torch.randn(64, 4, dtype=torch.float64)
    y = (x[:, 0] > 0).double().unsqueeze(1)
    net.train()
    for _ in range(5):
        opt.zero_grad()
        loss = nn.functional.binary_cross_entropy(net(x), y)
        loss.backward()
        opt.step()
    net.eval()

    path = str(tmp_path / "exported.npz")
    np.savez(
        path,
        **{k: v.detach().numpy() for k, v in net.state_dict().items()},
    )

    from feature_store_fraud_detection_spark.ml.torch_scoring import (
        forward,
        load_weights,
    )

    w = load_weights(path)
    xt = torch.randn(32, 4, dtype=torch.float64)
    want = net(xt).detach().numpy()[:, 0]
    got = forward(xt.numpy(), w)
    assert np.allclose(got, want, atol=1e-12)


def test_pcm_energy_windows_hand_fixture(spark):
    import math

    from feature_store_fraud_detection_spark.operators.multimodal import (
        pcm_energy_windows,
    )

    # frame=4 over "ab cdef": windows "ab c" -> codes [1,2,-64,3]
    # (space=32-96=-64): two sign changes (2->-64, -64->3); and "def "?
    # only len//4 = 1 full window from 7 chars -> exactly one window.
    df = spark.createDataFrame([(1, "ab cdef"), (2, "xy")],
                               "doc_id long, text string")
    out = pcm_energy_windows(df, "doc_id", "text", frame=4).collect()
    assert len(out) == 1  # doc 2 is shorter than one frame
    r = out[0]
    cs = [ord(c) - 96 for c in "ab c"]
    want_rms = math.floor(
        math.sqrt(sum(c * c for c in cs) / 4.0) * 10000 + 0.5
    ) / 10000
    assert (r.doc_id, r.win_idx, r.n_samples) == (1, 0, 4)
    assert r.rms == want_rms
    assert r.zero_crossings == 2
