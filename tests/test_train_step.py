"""Data-parallel train step on the virtual 8-device CPU mesh.

What the reference only exercises by actually running `accelerate launch`
(SURVEY §4/§2.4), we test hermetically: batch sharded over a `data` mesh, adapter
gradients all-reduced by XLA, one AdamW update.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
from ctrl_adapter_tpu.models.controlnet import ControlNetConfig, ControlNetModel
from ctrl_adapter_tpu.models.unet_i2vgen import I2VGenXLUNet, I2VGenXLUNetConfig
from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
from ctrl_adapter_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from ctrl_adapter_tpu.train.trainer import CtrlAdapterTrainer, TrainConfig
from .utils import fake_init

THIN_CHANNELS = (32, 32, 32, 32, 32, 32, 32, 64, 64, 64, 64, 64)


def _build(num_frames=2, hw=8):
    cfg = TrainConfig(
        model_name="i2vgenxl", n_sample_frames=num_frames, control_latent_size=hw,
        vae_scaling_factor=0.18215, num_experts=1,
    )
    unet = I2VGenXLUNet(config=I2VGenXLUNetConfig(
        block_out_channels=(32, 32, 64, 64), norm_num_groups=16,
        cross_attention_dim=32, attention_head_dim=16))
    cnet = ControlNetModel(config=ControlNetConfig(
        block_out_channels=(32, 32, 64, 64), num_attention_heads=(4, 4, 4, 4),
        cross_attention_dim=24, conditioning_embedding_out_channels=(8, 8, 16, 16),
        norm_num_groups=16))
    adapter = ControlNetAdapter(
        backbone_model_name="i2vgenxl", num_blocks=1, num_adapters_per_location=3,
        cross_attention_dim=32, adapter_locations=("A", "B", "C", "D", "M"),
        add_temporal_resnet=True, add_temporal_transformer=True,
        custom_down_block_channels=THIN_CHANNELS, custom_mid_block_channels=64,
        attention_head_dim=16)
    vae = AutoencoderKL(config=VAEConfig(
        block_out_channels=(16, 16, 16, 16), norm_num_groups=8, layers_per_block=1))
    return CtrlAdapterTrainer(cfg, unet, cnet, adapter, vae)


def _params_and_batch(trainer, b, f, hw):
    unet, cnet, adapter, vae = trainer.unet, trainer.controlnet, trainer.adapter, trainer.vae
    frozen = {
        "unet": fake_init(unet, jnp.ones((b, f, hw, hw, 4)), jnp.ones((b,)),
                          jnp.ones((b,)), jnp.ones((b, f, hw, hw, 4)),
                          jnp.ones((b, 1, 32)), jnp.ones((b, 7, 32))),
        "vae": fake_init(vae, jnp.ones((1, 8 * hw, 8 * hw, 3))),
    }
    cn_args = (jnp.ones((b * f, hw, hw, 4)), jnp.ones((b * f,)),
               jnp.ones((b * f, 7, 24)), jnp.ones((b * f, 8 * hw, 8 * hw, 3)))
    frozen["controlnet_0"] = fake_init(cnet, *cn_args)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(frozen["controlnet_0"], *cn_args))
    trainable = {"adapter": fake_init(
        adapter, [jnp.zeros(s.shape) for s in downs_s], jnp.zeros(mid_s.shape),
        f, jnp.ones((b * f,)), jnp.ones((1, 1, 32)))}
    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.uniform(-1, 1, (b, f, 8 * hw, 8 * hw, 3)).astype(np.float32)),
        "controlnet_cond": jnp.asarray(
            rng.uniform(0, 1, (1, b * f, 8 * hw, 8 * hw, 3)).astype(np.float32)),
        "controlnet_text_emb": jnp.ones((b, 7, 24)) * 0.1,
        "prompt_embeds": jnp.ones((b, 7, 32)) * 0.1,
        "image_embeddings": jnp.ones((b, 1, 32)) * 0.1,
    }
    return trainable, frozen, batch


@pytest.mark.slow
def test_train_step_updates_adapter_dp8():
    assert jax.device_count() == 8, "conftest must force 8 virtual CPU devices"
    mesh = create_mesh(8)
    trainer = _build()
    b, f, hw = 8, 2, 8
    trainable, frozen, batch = _params_and_batch(trainer, b, f, hw)
    opt_state = trainer.init_optimizer(trainable)

    trainable_r = replicate(mesh, trainable)
    frozen_r = replicate(mesh, frozen)
    opt_r = replicate(mesh, opt_state)
    batch_s = shard_batch(mesh, {k: v for k, v in batch.items() if k != "controlnet_cond"})
    # expert-major tensor shards on axis 1 (batch) — keep replicated for simplicity
    batch_s["controlnet_cond"] = replicate(mesh, batch["controlnet_cond"])

    # train_step donates trainable/opt buffers — snapshot before the call
    old_np = jax.tree.map(np.asarray, trainable_r)
    new_trainable, new_opt, metrics = trainer.train_step(
        trainable_r, opt_r, frozen_r, batch_s, None, jax.random.PRNGKey(0)
    )

    loss = float(metrics["loss"])
    assert np.isfinite(loss) and loss > 0
    # adapter params actually moved
    delta = jax.tree.reduce(
        lambda acc, pair: acc + float(jnp.abs(pair).sum()),
        jax.tree.map(lambda a, b_: np.asarray(a) - b_, new_trainable, old_np), 0.0)
    assert delta > 0


def _build_multi_expert(num_frames=2, hw=8, num_experts=2,
                        router_type="simple_weights"):
    from ctrl_adapter_tpu.models.router import ControlNetRouter

    cfg = TrainConfig(
        model_name="i2vgenxl", n_sample_frames=num_frames, control_latent_size=hw,
        vae_scaling_factor=0.18215, num_experts=num_experts, train_router=True,
    )
    unet = I2VGenXLUNet(config=I2VGenXLUNetConfig(
        block_out_channels=(32, 32, 64, 64), norm_num_groups=16,
        cross_attention_dim=32, attention_head_dim=16))
    cnet = ControlNetModel(config=ControlNetConfig(
        block_out_channels=(32, 32, 64, 64), num_attention_heads=(4, 4, 4, 4),
        cross_attention_dim=24, conditioning_embedding_out_channels=(8, 8, 16, 16),
        norm_num_groups=16))
    adapter = ControlNetAdapter(
        backbone_model_name="i2vgenxl", num_blocks=1, num_adapters_per_location=3,
        cross_attention_dim=32, adapter_locations=("A", "B", "C", "D", "M"),
        add_temporal_resnet=True, add_temporal_transformer=True,
        custom_down_block_channels=THIN_CHANNELS, custom_mid_block_channels=64,
        attention_head_dim=16)
    vae = AutoencoderKL(config=VAEConfig(
        block_out_channels=(16, 16, 16, 16), norm_num_groups=8, layers_per_block=1))
    router = ControlNetRouter(num_experts=num_experts, router_type=router_type,
                              num_routers=12, add_mid_block_router=True)
    return CtrlAdapterTrainer(cfg, unet, cnet, adapter, vae, router=router)


def _multi_expert_params_and_batch(trainer, b, f, hw, num_experts=2):
    trainable, frozen, batch = _params_and_batch(trainer, b, f, hw)
    rng = np.random.default_rng(7)
    # one frozen tower per expert (distinct weights) + expert-major condition images
    for e in range(1, num_experts):
        frozen[f"controlnet_{e}"] = fake_init(
            trainer.controlnet,
            jnp.ones((b * f, hw, hw, 4)), jnp.ones((b * f,)),
            jnp.ones((b * f, 7, 24)), jnp.ones((b * f, 8 * hw, 8 * hw, 3)),
            seed=100 + e)
    batch["controlnet_cond"] = jnp.asarray(
        rng.uniform(0, 1, (num_experts, b * f, 8 * hw, 8 * hw, 3)).astype(np.float32))
    trainable["router"] = fake_init(trainer.router, None, jnp.ones((num_experts,)))
    batch["expert_mask"] = jnp.ones((num_experts,), jnp.float32)
    return trainable, frozen, batch


@pytest.mark.slow
def test_train_step_multi_expert_router_dp8():
    """Multi-expert training with a trainable router on the dp8 mesh
    (reference `train.py:1110-1121,1244-1276`): loss finite, router params
    actually move (nonzero router grads), router weights surface in metrics."""
    assert jax.device_count() == 8
    mesh = create_mesh(8)
    trainer = _build_multi_expert()
    b, f, hw = 8, 2, 8
    trainable, frozen, batch = _multi_expert_params_and_batch(trainer, b, f, hw)
    opt_state = trainer.init_optimizer(trainable)

    trainable_r = replicate(mesh, trainable)
    frozen_r = replicate(mesh, frozen)
    opt_r = replicate(mesh, opt_state)
    batch_s = shard_batch(
        mesh, {k: v for k, v in batch.items()
               if k not in ("controlnet_cond", "expert_mask")})
    batch_s["controlnet_cond"] = replicate(mesh, batch["controlnet_cond"])
    batch_s["expert_mask"] = replicate(mesh, batch["expert_mask"])

    old_router_np = jax.tree.map(np.asarray, trainable_r["router"])  # donated
    new_trainable, _, metrics = trainer.train_step(
        trainable_r, opt_r, frozen_r, batch_s, None, jax.random.PRNGKey(0))

    assert np.isfinite(float(metrics["loss"]))
    assert "down_block_weights" in metrics and "mid_block_weights" in metrics
    dw = np.asarray(metrics["down_block_weights"])
    assert dw.shape == (12, 2)
    np.testing.assert_allclose(dw.sum(axis=-1), 1.0, atol=1e-5)
    router_delta = jax.tree.reduce(
        lambda acc, pair: acc + float(jnp.abs(pair).sum()),
        jax.tree.map(lambda a, b_: np.asarray(a) - b_,
                     new_trainable["router"], old_router_np), 0.0)
    assert router_delta > 0, "router gradients must be nonzero"


@pytest.mark.slow
def test_train_step_expert_mask_gates_masked_expert():
    """With expert_mask = [1, 0], the masked expert's router weight collapses to
    ~0 (−1e6 logit penalty, reference `ctrl_router.py:96-107`), so its tower's
    residuals cannot reach the adapter."""
    trainer = _build_multi_expert()
    b, f, hw = 2, 2, 8
    trainable, frozen, batch = _multi_expert_params_and_batch(trainer, b, f, hw)
    opt_state = trainer.init_optimizer(trainable)
    batch["expert_mask"] = jnp.asarray([1.0, 0.0])
    _, _, metrics = trainer.train_step(
        trainable, opt_state, frozen, batch, None, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    dw = np.asarray(metrics["down_block_weights"])
    np.testing.assert_allclose(dw[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(dw[:, 1], 0.0, atol=1e-5)


@pytest.mark.slow
def test_train_step_mixed_type_tower_swap_no_recompile():
    """Mixed-type training swaps a different frozen ControlNet into the step input
    between steps (`train.py:399-406`): same shapes -> the jit cache must hold and
    the loss must respond to the swapped tower."""
    trainer = _build(num_frames=2)
    b, f, hw = 2, 2, 8
    trainable, frozen, batch = _params_and_batch(trainer, b, f, hw)
    opt_state = trainer.init_optimizer(trainable)

    cache_size = type(trainer).train_step._cache_size
    # thread the (donated) trainable/opt buffers through the calls
    trainable, opt_state, m1 = trainer.train_step(
        trainable, opt_state, frozen, batch, None, jax.random.PRNGKey(3))
    after_first = cache_size()

    cn_args = (jnp.ones((b * f, hw, hw, 4)), jnp.ones((b * f,)),
               jnp.ones((b * f, 7, 24)), jnp.ones((b * f, 8 * hw, 8 * hw, 3)))
    frozen["controlnet_0"] = fake_init(trainer.controlnet, *cn_args, seed=42)
    _, _, m2 = trainer.train_step(
        trainable, opt_state, frozen, batch, None, jax.random.PRNGKey(3))

    assert cache_size() == after_first, "tower swap must not recompile"
    assert np.isfinite(float(m2["loss"]))
    assert float(m1["loss"]) != float(m2["loss"])  # the swapped tower is live


@pytest.mark.slow
def test_train_step_sparse_frames_single_device():
    trainer = _build(num_frames=4)
    b, f, hw = 2, 4, 8
    trainable, frozen, batch = _params_and_batch(trainer, b, f, hw)
    opt_state = trainer.init_optimizer(trainable)
    new_trainable, _, metrics = trainer.train_step(
        trainable, opt_state, frozen, batch, jnp.asarray([0, 2], jnp.int32),
        jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_sparse_frames_compile_once_per_k():
    """Random sparse-frame draws must NOT recompile the step: the indices are a
    traced (k,) array, so the jit cache holds at most one variant per k
    (reference redraws indices every step, `train.py:1280-1291`)."""
    trainer = _build(num_frames=4)
    b, f, hw = 1, 4, 8
    trainable, frozen, batch = _params_and_batch(trainer, b, f, hw)
    opt_state = trainer.init_optimizer(trainable)

    import random as pyrandom

    pyrandom.seed(0)
    seen_ks = set()
    draws = []
    for _ in range(8):
        k = pyrandom.randint(1, 2)
        seen_ks.add(k)
        draws.append(jnp.asarray(sorted(pyrandom.sample(range(f), k)), jnp.int32))
    # make sure both k values and multiple distinct index tuples occur
    assert seen_ks == {1, 2}

    cache_size = type(trainer).train_step._cache_size
    before = cache_size()
    for idx in draws:
        # thread the (donated) trainable/opt buffers through the loop
        trainable, opt_state, metrics = trainer.train_step(
            trainable, opt_state, frozen, batch, idx, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
    assert cache_size() - before <= len(seen_ks)


@pytest.mark.slow
def test_train_step_num_repeats_aggregation():
    """--num_repeats 2 --out_channels (reference `train.py:337-338`,
    `ctrl_adapter.py:78-100,208-221`): the adapter runs 2 repeats over
    location-A blocks and aggregates each repeat through zero-init 1x1 convs
    into a 32-wide residual; the trainer zero-pads the remaining slots (the
    reference's own zip-injection would crash its up blocks, see trainer note).
    Zero-convs start at 0, so step-0 loss must equal the adapterless loss, and
    the zero-conv kernels must receive gradient."""
    cfg = TrainConfig(
        model_name="i2vgenxl", n_sample_frames=2, control_latent_size=8,
        vae_scaling_factor=0.18215, num_experts=1,
    )
    unet = I2VGenXLUNet(config=I2VGenXLUNetConfig(
        block_out_channels=(32, 32, 64, 64), norm_num_groups=16,
        cross_attention_dim=32, attention_head_dim=16))
    cnet = ControlNetModel(config=ControlNetConfig(
        block_out_channels=(32, 32, 64, 64), num_attention_heads=(4, 4, 4, 4),
        cross_attention_dim=24, conditioning_embedding_out_channels=(8, 8, 16, 16),
        norm_num_groups=16))
    adapter = ControlNetAdapter(
        backbone_model_name="i2vgenxl", num_blocks=1, num_adapters_per_location=3,
        cross_attention_dim=32, adapter_locations=("A",),
        custom_down_block_channels=(32, 32, 32),
        attention_head_dim=16, num_repeats=2, out_channels=32)
    vae = AutoencoderKL(config=VAEConfig(
        block_out_channels=(16, 16, 16, 16), norm_num_groups=8, layers_per_block=1))
    trainer = CtrlAdapterTrainer(cfg, unet, cnet, adapter, vae)

    b, f, hw = 2, 2, 8
    frozen = {
        "unet": fake_init(unet, jnp.ones((b, f, hw, hw, 4)), jnp.ones((b,)),
                          jnp.ones((b,)), jnp.ones((b, f, hw, hw, 4)),
                          jnp.ones((b, 1, 32)), jnp.ones((b, 7, 32))),
        "vae": fake_init(vae, jnp.ones((1, 8 * hw, 8 * hw, 3))),
    }
    cn_args = (jnp.ones((b * f, hw, hw, 4)), jnp.ones((b * f,)),
               jnp.ones((b * f, 7, 24)), jnp.ones((b * f, 8 * hw, 8 * hw, 3)))
    frozen["controlnet_0"] = fake_init(cnet, *cn_args)
    downs_s, mid_s = jax.eval_shape(lambda: cnet.apply(frozen["controlnet_0"], *cn_args))
    trainable = {"adapter": fake_init(
        adapter, [jnp.zeros(s.shape) for s in downs_s], jnp.zeros(mid_s.shape),
        f, jnp.ones((b * f,)), jnp.ones((1, 1, 32)))}
    # fake_init randomizes every leaf; restore the zero-conv semantics under test
    ap = trainable["adapter"]["params"]
    zc_names = [k for k in ap if k.startswith("zero_convs_")]
    assert len(zc_names) == 6, zc_names  # 2 repeats x 3 location-A adapters
    for k in zc_names:
        ap[k]["kernel"] = jnp.zeros_like(ap[k]["kernel"])
        ap[k]["bias"] = jnp.zeros_like(ap[k]["bias"])
    opt_state = trainer.init_optimizer(trainable)

    rng_np = np.random.default_rng(3)
    batch = {
        "frames": jnp.asarray(
            rng_np.uniform(-1, 1, (b, f, 8 * hw, 8 * hw, 3)).astype(np.float32)),
        "controlnet_cond": jnp.asarray(
            rng_np.uniform(0, 1, (1, b * f, 8 * hw, 8 * hw, 3)).astype(np.float32)),
        "controlnet_text_emb": jnp.ones((b, 7, 24)) * 0.1,
        "prompt_embeds": jnp.ones((b, 7, 32)) * 0.1,
        "image_embeddings": jnp.ones((b, 1, 32)) * 0.1,
    }
    old_zc = {k: np.asarray(ap[k]["kernel"]) for k in zc_names}  # donated
    new_trainable, _, metrics = trainer.train_step(
        trainable, opt_state, frozen, batch, None, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # zero-convs moved => gradients flowed through the aggregation path
    zc_delta = sum(
        float(np.abs(np.asarray(new_trainable["adapter"]["params"][k]["kernel"])
                     - old_zc[k]).sum())
        for k in zc_names)
    assert zc_delta > 0, "zero-conv kernels must receive gradient"


@pytest.mark.slow
def test_gradient_checkpointing_preserves_loss_and_grads():
    """Remat is a scheduling choice, not a numerics one: the same batch/rng must
    produce the same loss and the same updated params with gradient_checkpointing
    on and off (reference --gradient_checkpointing parity, `train.py:676-681`)."""
    import dataclasses

    results = {}
    for remat in (True, False):
        trainer = _build()
        trainer.config = dataclasses.replace(
            trainer.config, gradient_checkpointing=remat)
        b, f, hw = 2, 2, 8
        trainable, frozen, batch = _params_and_batch(trainer, b, f, hw)
        opt_state = trainer.init_optimizer(trainable)
        new_trainable, _, metrics = trainer.train_step(
            trainable, opt_state, frozen, batch, None, jax.random.PRNGKey(5))
        results[remat] = (float(metrics["loss"]),
                          jax.tree.map(np.asarray, new_trainable))
    assert np.isclose(results[True][0], results[False][0], rtol=1e-5), \
        f"remat changed the loss: {results[True][0]} vs {results[False][0]}"
    # XLA reassociates reductions differently between the two programs; the
    # Adam update normalizes grads so tiny absolute diffs inflate relative
    # ones — observed worst case 4.6e-6 abs / 6.6e-4 rel on CPU.
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(a, b_, rtol=5e-3, atol=2e-5),
        results[True][1], results[False][1])
