import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import TINY_RESNET_CLIP, TINY_VIT_CLIP
from tris_tpu.models.clip import CLIP
from tris_tpu.models.stage1 import Stage1Config, TRISStage1, focal_penalty
from tris_tpu.models.stage2 import Stage2Config, TRISStage2


@pytest.fixture(scope="module")
def stage1_model():
    cfg = Stage1Config(hidden_dim=32, clip_override=TINY_RESNET_CLIP)
    model = TRISStage1(cfg)
    img = jnp.zeros((2, 64, 64, 3))
    ids = jnp.ones((2, 20), jnp.int32).at[:, -1].set(49407)
    variables = model.init(jax.random.PRNGKey(0), img, ids, train=True)
    return model, variables


def test_stage1_train_outputs(stage1_model):
    model, variables = stage1_model
    img = jnp.array(np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
    ids = jnp.ones((2, 20), jnp.int32).at[:, -1].set(49407)
    (cls_out, cls_fg, relu_map, sig_map, scale), _ = model.apply(
        variables, img, ids, train=True, mutable=["batch_stats"]
    )
    assert cls_out.shape == (2, 2)
    assert cls_fg.shape == (2,)
    assert relu_map.shape == (2, 64, 64, 1)
    assert sig_map.shape == (2, 64, 64, 1)
    assert (np.asarray(relu_map) >= 0).all()
    assert (np.asarray(sig_map) > 0).all() and (np.asarray(sig_map) < 1).all()
    assert np.isfinite(np.asarray(cls_out)).all()


def test_stage1_eval_output(stage1_model):
    model, variables = stage1_model
    img = jnp.zeros((2, 64, 64, 3))
    ids = jnp.ones((2, 20), jnp.int32).at[:, -1].set(49407)
    out = model.apply(variables, img, ids, train=False)
    assert out.shape == (2, 64, 64, 1)


def test_stage1_no_fusion():
    cfg = Stage1Config(hidden_dim=32, attn_multi=0.0, clip_override=TINY_RESNET_CLIP)
    model = TRISStage1(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    ids = jnp.ones((1, 20), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, ids, train=False)
    assert "attn_fusion" not in variables["params"]
    out = model.apply(variables, img, ids, train=False)
    assert out.shape == (1, 64, 64, 1)


def test_focal_penalty_value():
    x = jnp.array([0.5])
    got = float(focal_penalty(x, p=3.0, c=0.01)[0])
    assert np.isclose(got, (0.5 ** 3) * np.log(0.51), atol=1e-6)


def test_stage2_outputs():
    cfg = Stage2Config(clip_override=TINY_RESNET_CLIP)
    model = TRISStage2(cfg)
    img = jnp.zeros((2, 64, 64, 3))
    ids = jnp.ones((2, 20), jnp.int32).at[:, -1].set(49407)
    variables = model.init(jax.random.PRNGKey(0), img, ids, train=True)
    outs, _ = model.apply(variables, img, ids, train=True, mutable=["batch_stats"])
    assert len(outs) == 4
    for o in outs:
        assert o.shape == (2, 64, 64, 1)
    out = model.apply(variables, img, ids, train=False)
    assert out.shape == (2, 64, 64, 1)


def test_vit_critic_embeds():
    model = CLIP(TINY_VIT_CLIP)
    img = jnp.zeros((2, 64, 64, 3))
    ids = jnp.ones((2, 20), jnp.int32).at[:, -1].set(49407)
    variables = model.init(jax.random.PRNGKey(0), img, ids)
    feat = model.apply(variables, img, method="encode_image")
    assert feat.shape == (2, 64)
    li, lt = model.apply(variables, img, ids)
    assert li.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, atol=1e-6)


def test_full_size_configs_build():
    """Full RN50/RN101/ViT configs construct with consistent shapes
    (jax.eval_shape: no FLOPs)."""
    for backbone in ("RN50", "RN101"):
        cfg = Stage1Config(backbone=backbone, hidden_dim=1024)
        model = TRISStage1(cfg)
        shapes = jax.eval_shape(
            lambda m=model: m.init(
                jax.random.PRNGKey(0), jnp.zeros((2, 320, 320, 3)),
                jnp.ones((2, 20), jnp.int32), train=True,
            )
        )
        assert "backbone" in shapes["params"]
        # lan_project maps the projected text embed (1024 RN50 / 512 RN101)
        want_in = 1024 if backbone == "RN50" else 512
        assert shapes["params"]["lan_project"]["kernel"].shape == (want_in, 1024)
    s2 = TRISStage2(Stage2Config(backbone="RN50"))
    shapes = jax.eval_shape(
        lambda: s2.init(jax.random.PRNGKey(0), jnp.zeros((2, 320, 320, 3)),
                        jnp.ones((2, 20), jnp.int32), train=True)
    )
    assert shapes["params"]["attention4"]["Wk"]["kernel"].shape == (512, 2048)


def test_text_eot_selection():
    """EOT embedding must come from the argmax(id) position (model.py:562)."""
    model = CLIP(TINY_RESNET_CLIP)
    ids1 = jnp.zeros((1, 20), jnp.int32).at[:, 0].set(100).at[:, 5].set(49407)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), ids1)
    _, eot1 = model.apply(variables, ids1, method="encode_text")
    # change ids after the EOT position: embedding at EOT must change too
    # (causal mask means *earlier* ids affect it, later ones don't)
    ids2 = ids1.at[:, 10].set(200)
    _, eot2 = model.apply(variables, ids2, method="encode_text")
    np.testing.assert_allclose(np.asarray(eot1), np.asarray(eot2), atol=1e-6)
    ids3 = ids1.at[:, 2].set(300)
    _, eot3 = model.apply(variables, ids3, method="encode_text")
    assert np.abs(np.asarray(eot1) - np.asarray(eot3)).max() > 1e-6


def _rand_ids(rng, b, s=None):
    shape = (b, 20) if s is None else (b, s, 20)
    ids = rng.integers(1, 49406, size=shape).astype(np.int32)
    ids[..., 0] = 49406
    ids[..., -1] = 49407
    return jnp.asarray(ids)


def test_response_maps_match_batch1_forward(stage1_model):
    """response_maps (shared trunk, per-pair fusion) must equal the reference
    eval protocol: one batch-1 __call__ per (image, sentence) pair
    (validate.py:173-179). Covers the attn_multi>0 fusion branch."""
    model, variables = stage1_model
    rng = np.random.default_rng(1)
    B, S = 2, 3
    img = jnp.asarray(rng.standard_normal((B, 64, 64, 3)), jnp.float32)
    ids = _rand_ids(rng, B, S)
    got = model.apply(variables, img, ids, method="response_maps")
    assert got.shape == (B, S, 64, 64)
    for b in range(B):
        for s in range(S):
            want = model.apply(variables, img[b : b + 1], ids[b, s][None], train=False)
            np.testing.assert_allclose(
                np.asarray(got[b, s]), np.asarray(want[0, :, :, 0]), atol=2e-5, rtol=1e-5
            )


def test_response_maps_match_batch1_no_fusion():
    cfg = Stage1Config(hidden_dim=32, attn_multi=0.0, clip_override=TINY_RESNET_CLIP)
    model = TRISStage1(cfg)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    ids = _rand_ids(rng, 2, 2)
    variables = model.init(jax.random.PRNGKey(0), img, ids[:, 0], train=False)
    got = model.apply(variables, img, ids, method="response_maps")
    for b in range(2):
        for s in range(2):
            want = model.apply(variables, img[b : b + 1], ids[b, s][None], train=False)
            np.testing.assert_allclose(
                np.asarray(got[b, s]), np.asarray(want[0, :, :, 0]), atol=2e-5, rtol=1e-5
            )


def test_stage2_response_maps_match_flattened():
    cfg = Stage2Config(clip_override=TINY_RESNET_CLIP)
    model = TRISStage2(cfg)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    ids = _rand_ids(rng, 2, 3)
    variables = model.init(jax.random.PRNGKey(0), img, ids[:, 0], train=False)
    got = model.apply(variables, img, ids, method="response_maps")
    assert got.shape == (2, 3, 64, 64)
    for b in range(2):
        for s in range(3):
            want = model.apply(variables, img[b : b + 1], ids[b, s][None], train=False)
            np.testing.assert_allclose(
                np.asarray(got[b, s]), np.asarray(want[0, :, :, 0]), atol=2e-5, rtol=1e-5
            )
