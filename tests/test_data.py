import numpy as np
import pytest

from tests.fixtures import make_fake_refcoco
from tris_tpu.data.dataset import Loader, ReferSegDataset
from tris_tpu.data.refer import REFER


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("refdata")
    return make_fake_refcoco(str(root))


def test_refer_index(fake_root):
    root, expected = fake_root
    refer = REFER(root, "refcoco", "unc")
    assert len(refer.Refs) == 12
    assert len(refer.Imgs) == 6
    train_ids = refer.getRefIds(split="train")
    assert len(train_ids) == 6  # 3 train images x 2 refs
    val_ids = refer.getRefIds(split="val")
    assert len(val_ids) == 2
    ta = refer.getRefIds(split="testA")
    tb = refer.getRefIds(split="testB")
    assert len(ta) == 2 and len(tb) == 2
    # 'test' matches both testA and testB
    assert set(refer.getRefIds(split="test")) == set(ta) | set(tb)


def test_refer_get_mask(fake_root):
    root, expected = fake_root
    refer = REFER(root, "refcoco", "unc")
    rid = refer.getRefIds(split="train")[0]
    ref = refer.Refs[rid]
    m = refer.getMask(ref)
    x0, y0, bw, bh = expected[rid]["rect"]
    mask = m["mask"]
    assert mask.shape == (48, 64)
    # rectangle rasterizes to roughly its box
    assert abs(int(mask.sum()) - bw * bh) <= (bw + bh) * 2
    assert mask[y0 + 2, x0 + 2] == 1
    assert mask[1, 1] == 0


def test_train_example(fake_root):
    root, _ = fake_root
    ds = ReferSegDataset(root, split="train", size=64, max_tokens=20, negative_samples=3)
    rng = np.random.default_rng(0)
    ex = ds.train_example(0, rng)
    assert ex["image"].shape == (64, 64, 3)
    assert ex["image"].dtype == np.float32
    assert ex["word_ids"].shape == (20,)
    assert ex["word_ids"][0] == 49406
    assert ex["neg_word_ids"].shape == (3, 20)
    # negatives come from the other ref of the same image -> different text
    assert not np.array_equal(ex["neg_word_ids"][0], ex["word_ids"])


def test_eval_example(fake_root):
    root, expected = fake_root
    ds = ReferSegDataset(root, split="val", size=64, eval_mode=True)
    ex = ds.eval_example(0)
    assert ex["word_ids"].shape == (ex["num_sents"], 20)  # unpadded; Loader buckets
    assert ex["num_sents"] == 2
    assert ex["target"].shape == (48, 64)
    assert ex["orig_size"].tolist() == [48, 64]
    x1, y1, x2, y2 = ex["bbox"]
    rid = ds.ref_ids[0]
    x0, y0, bw, bh = expected[rid]["rect"]
    assert [x1, y1, x2, y2] == [x0, y0, x0 + bw, y0 + bh]


def test_loader_batching_and_determinism(fake_root):
    root, _ = fake_root
    ds = ReferSegDataset(root, split="train", size=64, negative_samples=2)
    loader = Loader(ds, batch_size=2, shuffle=True, seed=5, num_threads=2)
    b1 = list(loader.epoch(0))
    b2 = list(loader.epoch(0))
    assert len(b1) == 3
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a["word_ids"], b["word_ids"])
        np.testing.assert_allclose(a["image"], b["image"])
    assert b1[0]["image"].shape == (2, 64, 64, 3)
    assert b1[0]["neg_word_ids"].shape == (2, 2, 20)
    # different epoch -> different order
    b3 = list(loader.epoch(1))
    assert any(
        not np.array_equal(a["word_ids"], c["word_ids"]) for a, c in zip(b1, b3)
    )


def test_eval_loader_buckets_and_pads_final_batch(fake_root):
    """Eval batches pad sentences to a power-of-two bucket of the batch max
    (not the dataset-wide max) and pad the short final batch to full size with
    num_sents=0 rows (VERDICT r1 item 6: kills per-S and last-batch recompiles)."""
    root, _ = fake_root
    ds = ReferSegDataset(root, split="train", size=64, eval_mode=True)  # 6 refs
    loader = Loader(ds, batch_size=4, shuffle=False, drop_last=False, num_threads=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    for batch in batches:
        S = batch["word_ids"].shape[1]
        assert S & (S - 1) == 0  # power of two
        assert S >= max(int(n) for n in batch["num_sents"])
        assert batch["word_ids"].shape[0] == 4  # always full batch
        assert "batch_valid" in batch
    last = batches[-1]  # 6 % 4 = 2 real rows, 2 padded
    assert last["batch_valid"].tolist() == [1, 1, 0, 0]
    assert last["num_sents"][2:].tolist() == [0, 0]


def test_loader_process_sharding(fake_root):
    root, _ = fake_root
    ds = ReferSegDataset(root, split="train", size=64)
    ids = []
    for p in range(2):
        loader = Loader(ds, batch_size=1, shuffle=False, drop_last=False,
                        num_threads=1, process_index=p, process_count=2)
        for batch in loader.epoch(0):
            ids.append(int(batch["word_ids"][0, 1]))
    assert len(ids) == 6  # all examples covered exactly once across processes


def test_device_normalize_matches_host(fake_root):
    """The u8 feed's on-device normalize (ops/normalize.py) must reproduce
    the host LUT ((v/255 - mean) / std) to float rounding for every u8 value,
    and the u8 dataset mode must ship exactly the pre-normalize bytes."""
    import jax.numpy as jnp

    from tris_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from tris_tpu.ops.normalize import image_input_to_f32

    v = np.arange(256, dtype=np.uint8)
    u8 = np.stack([v, v, v], axis=-1)[None]  # [1, 256, 3] per-channel sweep
    host = ((u8.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
    dev = np.asarray(image_input_to_f32(jnp.asarray(u8)))
    np.testing.assert_allclose(dev, host, atol=1e-6)  # fused-multiply rounding, ~2 ulp at |2.1|
    # float input passes through untouched
    f32 = host.astype(np.float32)
    np.testing.assert_array_equal(np.asarray(image_input_to_f32(jnp.asarray(f32))), f32)


def test_u8_feed_matches_f32_feed(fake_root):
    """ReferSegDataset(u8_images=True) ships resized uint8; normalizing it
    on device must equal the f32 feed's host-normalized image to float
    rounding (same decode + resize bytes underneath)."""
    import jax.numpy as jnp

    from tris_tpu.ops.normalize import image_input_to_f32

    root, _ = fake_root
    ds_f32 = ReferSegDataset(root, split="train", size=64)
    ds_u8 = ReferSegDataset(root, split="train", size=64, u8_images=True)
    rng = np.random.default_rng(0)
    ex_u8 = ds_u8.train_example(0, np.random.default_rng(0))
    ex_f32 = ds_f32.train_example(0, rng)
    assert ex_u8["image"].dtype == np.uint8
    dev = np.asarray(image_input_to_f32(jnp.asarray(ex_u8["image"])))
    np.testing.assert_allclose(dev, ex_f32["image"], atol=1e-6)

    loader = Loader(ds_u8, batch_size=2, shuffle=False, drop_last=False, num_threads=1)
    batch = next(iter(loader.epoch(0)))
    assert batch["image"].dtype == np.uint8
