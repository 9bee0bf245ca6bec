"""Extras: num_repeats adapter path, flash-attention dispatch, converter structure,
conditions frontend, data collation."""

import numpy as np
import jax
import jax.numpy as jnp

from ctrl_adapter_tpu.convert.torch_to_jax import convert_state_dict
from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
from ctrl_adapter_tpu.ops.flash_attention import _eligible
from .utils import eager_apply, fake_init


def test_num_repeats_zero_conv_aggregation():
    """num_repeats>1: 12 slots collapse into num_repeats aggregated tensors through
    zero-init 1x1 convs (reference `ctrl_adapter.py:208-221`) — zero at init."""
    adapter = ControlNetAdapter(
        backbone_model_name="i2vgenxl", num_blocks=1, num_adapters_per_location=1,
        cross_attention_dim=16, adapter_locations=("A",),
        add_temporal_resnet=False, add_temporal_transformer=False,
        custom_down_block_channels=(32,), attention_head_dim=16,
        num_repeats=2, out_channels=32,
    )
    downs = [jnp.ones((2, 4, 4, 32)) for _ in range(12)]
    params = fake_init(adapter, downs, None, 2, jnp.ones((2,)), jnp.ones((1, 1, 16)))
    out, mid = eager_apply(adapter, params, downs, None, 2, jnp.ones((2,)),
                           jnp.ones((1, 1, 16)))
    assert len(out) == 2 and mid is None
    for o in out:
        assert o.shape == (2, 4, 4, 32)
        # fake_init fills zero-conv kernels with random values, so outputs are nonzero;
        # the aggregation contract (2 outputs, not 12) is what we assert here.
        assert np.isfinite(np.asarray(o)).all()


def test_flash_attention_eligibility():
    q = jnp.zeros((2, 4096, 5, 64))
    assert _eligible(q, q)
    assert not _eligible(jnp.zeros((2, 77, 5, 64)), jnp.zeros((2, 77, 5, 64)))  # small
    assert not _eligible(q, jnp.zeros((2, 77, 5, 64)))  # cross
    assert not _eligible(jnp.zeros((2, 4096, 8, 40)), jnp.zeros((2, 4096, 8, 40)))  # head dim
    # CPU fallback still computes correctly through the dispatcher
    from ctrl_adapter_tpu.ops.flash_attention import dot_product_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 16, 2, 8)).astype(np.float32))
    out = dot_product_attention(q, q, q)
    ref = jax.nn.dot_product_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_converter_nested_structure():
    sd = {
        "down_blocks.0.resnets.1.conv1.weight": np.zeros((8, 4, 3, 3), np.float32),
        "down_blocks.0.resnets.1.norm1.weight": np.ones((4,), np.float32),
        "down_blocks.0.attentions.0.to_out.0.bias": np.zeros((8,), np.float32),
        "time_embedding.linear_1.weight": np.zeros((16, 4), np.float32),
        "mix_factor": np.asarray([0.5], np.float32),
    }
    tree = convert_state_dict(sd)
    assert tree["down_blocks_0"]["resnets_1"]["conv1"]["kernel"].shape == (3, 3, 4, 8)
    assert tree["down_blocks_0"]["resnets_1"]["norm1"]["scale"].shape == (4,)
    assert tree["down_blocks_0"]["attentions_0"]["to_out_0"]["bias"].shape == (8,)
    assert tree["time_embedding"]["linear_1"]["kernel"].shape == (4, 16)
    assert tree["mix_factor"].shape == (1,)


def test_canny_extraction_and_collate():
    from ctrl_adapter_tpu.conditions.extractors import ConditionExtractor
    from ctrl_adapter_tpu.data.loader import collate

    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    ex = ConditionExtractor()
    edges = ex.extract("canny", [img, img])
    assert edges[0].shape == (64, 64, 3) and edges[0].dtype == np.uint8
    assert set(np.unique(edges[0])) <= {0, 255}

    items = [
        {"frames": np.zeros((2, 8, 8, 3), np.float32),
         "conditions": np.zeros((1, 2, 16, 16, 3), np.float32),
         "caption": "a"},
        {"frames": np.zeros((2, 8, 8, 3), np.float32),
         "conditions": np.zeros((1, 2, 16, 16, 3), np.float32),
         "caption": "b"},
    ]
    batch = collate(items)
    assert batch["frames"].shape == (2, 2, 8, 8, 3)
    assert batch["controlnet_cond"].shape == (1, 4, 16, 16, 3)


def test_shuffle_extraction():
    """Content shuffle (`ctrl_helper.py:118-120`): layout destroyed, palette kept."""
    from ctrl_adapter_tpu.conditions.extractors import ConditionExtractor

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    ex = ConditionExtractor()
    out = ex.extract("shuffle", [img])[0]
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    # output pixels are resampled from the source image -> value range bounded by it
    assert out.min() >= img.min() and out.max() <= img.max()
    # and the layout actually changes
    assert not np.array_equal(out, img)


def test_image_utils_roundtrip():
    from ctrl_adapter_tpu.utils.image import (
        center_crop_and_resize, image_to_tensor, image_to_unit, unit_to_uint8,
    )

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (100, 160, 3), dtype=np.uint8)
    out = center_crop_and_resize(img, (64, 64))
    assert out.shape == (64, 64, 3)
    t = image_to_tensor(out)
    assert -1.0 <= t.min() and t.max() <= 1.0
    u = image_to_unit(out)
    back = unit_to_uint8(u)
    np.testing.assert_array_equal(back, out)


def test_prefetcher_streams_batches():
    """Async host pipeline (SURVEY §7 hard-part 5): batches stream from worker
    threads and correspond to (frames, conditions) of the SAME item."""
    import numpy as np

    from ctrl_adapter_tpu.data.loader import Prefetcher

    class TinyDataset:
        def __len__(self):
            return 4

        def get(self, idx):
            base = np.full((2, 8, 8, 3), float(idx), np.float32)
            return {
                "frames": base,
                "caption": f"item {idx}",
                "first_frame": base[0],
                "conditions": base[None],  # (E=1, f, h, w, 3)
            }

    pf = Prefetcher(TinyDataset(), batch_size=2, num_workers=2, queue_depth=2)
    try:
        for _ in range(3):
            batch = pf.next()
            assert batch["frames"].shape == (2, 2, 8, 8, 3)
            assert batch["controlnet_cond"].shape == (1, 4, 8, 8, 3)
            # expert-major layout keeps frame<->condition correspondence per item
            conds = batch["controlnet_cond"][0].reshape(2, 2, 8, 8, 3)
            np.testing.assert_array_equal(conds, batch["frames"])
    finally:
        pf.close()


def test_checkpoint_roundtrip(tmp_path):
    """orbax save/load in the reference's checkpoint-{step}/adapter_{step} layout
    (`train.py:406-421,1009-1015`)."""
    import jax.numpy as jnp
    import numpy as np

    from ctrl_adapter_tpu.train.checkpoints import load_checkpoint, save_checkpoint

    adapter = {"params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}}
    router = {"params": {"logits": jnp.asarray([0.5, -0.5])}}
    ckpt = save_checkpoint(str(tmp_path), 7, adapter, router,
                           config={"model_name": "i2vgenxl"})
    assert ckpt.endswith("checkpoint-7")

    templates = (
        jax.tree.map(jnp.zeros_like, adapter),
        jax.tree.map(jnp.zeros_like, router),
    )
    out = load_checkpoint(ckpt, 7, *templates)
    np.testing.assert_array_equal(np.asarray(out["adapter"]["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(out["router"]["params"]["logits"]),
                                  [0.5, -0.5])


def test_video_dataset_and_mixed_prefetch():
    """Real mp4 pipeline on the reference sample_data: fps-sampled frames,
    canny extraction, per-batch mixed-control-type choice and a post_collate
    encoder stage running inside the worker (`train.py:770-865,1110-1124`)."""
    import numpy as np

    from ctrl_adapter_tpu.data.loader import Prefetcher, VideoDataset

    ds = VideoDataset(
        "/root/reference/sample_data/videos",
        "/root/reference/sample_data/video_captions.csv",
        n_sample_frames=2, output_fps=4, size=64, control_types=["canny"],
    )
    assert len(ds) >= 1
    item = ds.get(0)
    assert item["frames"].shape == (2, 64, 64, 3)
    assert item["conditions"].shape == (1, 2, 64, 64, 3)
    assert isinstance(item["caption"], str)

    seen_types = []

    def post_collate(batch):
        caps = batch.pop("captions")
        first = batch.pop("first_frames")
        assert first.shape[0] == len(caps) == 1
        batch["controlnet_text_emb"] = np.zeros((len(caps), 77, 768), np.float32)
        return batch

    pf = Prefetcher(
        ds, batch_size=1, num_workers=1, queue_depth=1, seed=0,
        control_types_chooser=lambda rng: [rng.choice(["canny", "canny"])],
        post_collate=post_collate)
    try:
        for _ in range(2):
            batch = pf.next()
            assert batch["control_types"] == ["canny"]
            seen_types.append(batch["control_types"][0])
            assert batch["frames"].shape == (1, 2, 64, 64, 3)
            assert batch["controlnet_cond"].shape == (1, 2, 64, 64, 3)
            assert batch["controlnet_text_emb"].shape == (1, 77, 768)
    finally:
        pf.close()
    assert seen_types == ["canny", "canny"]
