"""Golden-value regression tests: fixed-seed tiny models must keep producing
the same numbers. Catches silent numerical drift from refactors (layer
reorderings, changed initializers, precision changes).

If a change intentionally alters values (e.g. new init scheme), regenerate
with: python -m tests.test_golden
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import TINY_RESNET_CLIP, TINY_VIT_CLIP
from tris_tpu.models.clip import CLIP
from tris_tpu.models.stage1 import Stage1Config, TRISStage1

GOLDEN = {
    # regenerate with `python -m tests.test_golden` (CPU, highest precision)
    "clip_image_checksum": -0.39536008,
    "clip_text_checksum": -8.20103264,
    "vit_checksum": -11.26447678,
    "stage1_train_checksum": 2627.98193,
}


def _inputs():
    key = jax.random.PRNGKey(42)
    img = jax.random.normal(key, (2, 64, 64, 3), jnp.float32) * 0.5
    ids = jnp.zeros((2, 20), jnp.int32).at[:, 0].set(49406).at[:, 1].set(320).at[:, 2].set(49407)
    return img, ids


def _compute():
    img, ids = _inputs()
    out = {}
    m = CLIP(TINY_RESNET_CLIP)
    v = m.init(jax.random.PRNGKey(0), img, ids)
    pooled = m.apply(v, img, method="encode_image")[4][0]
    out["clip_image_checksum"] = float(jnp.sum(pooled))
    _, eot = m.apply(v, ids, method="encode_text")
    out["clip_text_checksum"] = float(jnp.sum(eot))

    vit = CLIP(TINY_VIT_CLIP)
    vv = vit.init(jax.random.PRNGKey(1), img, ids)
    out["vit_checksum"] = float(jnp.sum(vit.apply(vv, img, method="encode_image")))

    s1 = TRISStage1(Stage1Config(hidden_dim=32, clip_override=TINY_RESNET_CLIP))
    sv = s1.init(jax.random.PRNGKey(2), img, ids, train=True)
    (cls_out, cls_fg, relu_map, sig_map, scale), _ = s1.apply(
        sv, img, ids, train=True, mutable=["batch_stats"]
    )
    out["stage1_train_checksum"] = float(jnp.sum(cls_out) + jnp.sum(sig_map))
    return out


def test_golden_values():
    got = _compute()
    for k, want in GOLDEN.items():
        assert np.isclose(got[k], want, rtol=2e-3), (k, got[k], want)


if __name__ == "__main__":
    import json

    print(json.dumps(_compute(), indent=2))
