"""Mixed-precision path: bf16 activations with f32 entropy/loss math."""

import numpy as np
import jax
import jax.numpy as jnp

from mmnc_tpu.models import build_model


def test_bf16_forward_and_loss_finite():
    m = build_model(2, ["rgb", "mono"], latent_channels=8, conv_channels=4,
                    lmbda=1e-2, dtype=jnp.bfloat16)
    batch = m.example_batch(batch_size=1, image_size=256)
    v = m.init(jax.random.PRNGKey(0), batch)

    # params stay f32 (master weights); activations run bf16
    assert v["params"]["compressor"]["g_a"]["Conv_0"]["kernel"].dtype == jnp.float32

    x_hats, lik = m.forward(v, batch, rng=jax.random.PRNGKey(1), training=True)
    assert x_hats["rgb"].dtype == jnp.bfloat16
    # entropy math upcasts: likelihoods come out f32 and positive
    assert lik["y"].dtype == jnp.float32
    assert jnp.all(lik["y"] > 0)

    loss, (logs, _, _) = m.loss_and_logs(v, batch, jax.random.PRNGKey(2))
    assert loss.dtype == jnp.float32
    assert bool(jnp.isfinite(loss))


def test_bf16_train_step_decreases_loss():
    from mmnc_tpu.train import create_train_state, make_train_step

    m = build_model(1, ["mono"], latent_channels=8, conv_channels=4,
                    lmbda=1e-2, learning_rate_main=1e-3, dtype=jnp.bfloat16)
    batch = m.example_batch(batch_size=2, image_size=256)
    v = m.init(jax.random.PRNGKey(0), batch)
    state = create_train_state(v["params"], 20, learning_rate_main=1e-3)
    step = make_train_step(m, compute_metrics=False, donate=False)
    losses = []
    for _ in range(6):
        state, logs = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(logs["train/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
