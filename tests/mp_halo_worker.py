"""Worker for the 2-process spatial-halo test: the canvas is row-sharded
across processes and the halo/fold-tail ``ppermute`` hops cross the process
boundary (Gloo locally; ICI/DCN on pods).  Each rank checks the sharded
result against a locally-computed single-device reference."""

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

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from unmicst_tpu.core import unet
    from unmicst_tpu.core.hp import HParams
    from unmicst_tpu.infer import InferenceEngine
    from unmicst_tpu.runtime import halo
    from unmicst_tpu.runtime.mesh import make_mesh

    hp = HParams(
        im_size=32, n_channels=1, n_classes=3, n_out0=4, ks=3, n_layers=1,
        std_dev0=0.5,
    )
    params = unet.init_params(jax.random.PRNGKey(3), hp, "legacy")
    image = np.random.RandomState(0).rand(100, 60).astype(np.float32)

    mesh = make_mesh(data=2, model=1)
    canvas = halo.build_canvas(image, hp, 2)
    gcanvas = jax.device_put(canvas, NamedSharding(mesh, P()))

    jit_fn = jax.jit(
        lambda p, c: halo.spatial_infer(
            p, c, 100, 60, hp, "legacy", mesh, mean=0.3, std=0.2
        )
    )
    probs = jit_fn(params, gcanvas)
    from jax.experimental import multihost_utils

    full = multihost_utils.process_allgather(probs, tiled=True)
    got = np.moveaxis(np.asarray(full), -1, 0)

    ref = InferenceEngine(hp, params, "legacy", 0.3, 0.2).infer(image)
    err = float(np.abs(got - ref).max())
    assert err < 2e-5, err
    print(f"RANK{rank}_HALO_OK err={err:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
