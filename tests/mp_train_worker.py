"""Worker for the 2-process distributed training test (run by
test_multiprocess.py).  Each process owns one CPU device; the train step's
gradient all-reduce crosses the process boundary via the Gloo backend —
the CI stand-in for multi-host DCN collectives."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass


def main() -> int:
    rank = int(sys.argv[1])
    port = sys.argv[2]
    from unmicst_tpu.runtime.mesh import initialize_distributed

    initialize_distributed(f"localhost:{port}", 2, rank)
    assert jax.process_count() == 2

    import numpy as np

    from unmicst_tpu import train as tr
    from unmicst_tpu.core.hp import HParams
    from unmicst_tpu.runtime.mesh import data_sharding, make_mesh

    hp = HParams(
        im_size=16, n_channels=1, n_classes=3, n_out0=4, ks=3, n_layers=1,
        batch_size=2,
    )
    cfg = tr.TrainConfig.for_variant("v2", n_aug=1, lr0=1e-3, seed=0)
    mesh = make_mesh(data=2, model=1)
    trainer = tr.Trainer(hp, cfg, model_path="/tmp/mp_model", mesh=mesh)

    rng = np.random.RandomState(0)  # identical in both processes
    batch = {
        "image": rng.rand(2, 16, 16, 1).astype(np.float32),
        "labels": np.eye(3, dtype=np.float32)[rng.randint(0, 3, (2, 16, 16))],
        "weights": np.ones((2, 16, 16, 3), np.float32),
    }
    sharding = data_sharding(mesh)
    gbatch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
    params, opt_state, metrics = trainer.train_step(
        trainer.params, trainer.opt_state, gbatch, jax.random.PRNGKey(0)
    )
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"RANK{rank}_LOSS={loss:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
