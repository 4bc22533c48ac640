"""Worker for the 2-process sharded-streaming test: each stripe's tile
grid is column-sharded over a mesh that SPANS PROCESS BOUNDARIES (Gloo
locally; ICI/DCN on pods), so both the input-halo and fold-tail ppermute
hops and the global-array staging cross processes.  Each rank checks the
sharded result against its locally-computed single-device streaming
output (solo + duo stack)."""

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

    import numpy as np

    from unmicst_tpu.core import unet
    from unmicst_tpu.core.hp import HParams
    from unmicst_tpu.runtime.mesh import make_mesh
    from unmicst_tpu.runtime.pipeline import StreamingEngine

    rng = np.random.RandomState(0)
    mesh = make_mesh(data=2, model=1)

    # solo
    hp = HParams(
        im_size=32, n_channels=1, n_classes=3, n_out0=4, ks=3, n_layers=1,
        std_dev0=0.5,
    )
    params = unet.init_params(jax.random.PRNGKey(3), hp, "legacy")
    raw = (rng.rand(100, 200) * 60000).astype(np.uint16)
    stream = StreamingEngine(
        hp, params, "legacy", 0.3, 0.2, stripe_tile_rows=2
    )
    single = stream.infer(raw)
    sharded = stream.infer_sharded(raw, mesh, axis="data")
    err = int(np.abs(single.astype(int) - sharded.astype(int)).max())
    assert err <= 1, err

    # duo stack (per-channel global ranges)
    duo_hp = HParams(
        im_size=32, n_channels=2, n_classes=3, n_out0=4, ks=3, n_layers=1,
        std_dev0=0.5,
    )
    duo_params = unet.init_params(jax.random.PRNGKey(4), duo_hp, "v2")
    planes = [(rng.rand(90, 170) * 60000).astype(np.uint16) for _ in range(2)]
    duo = StreamingEngine(
        duo_hp, duo_params, "v2", 0.1, 0.9, stripe_tile_rows=2
    )
    duo_single = duo.infer_stack(planes)
    duo_sharded = duo.infer_sharded_stack(planes, mesh, axis="data")
    duo_err = int(
        np.abs(duo_single.astype(int) - duo_sharded.astype(int)).max()
    )
    assert duo_err <= 1, duo_err

    print(f"RANK{rank}_STREAM_OK err={err} duo_err={duo_err}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
