"""UnMICST-TPU: a TPU-native whole-slide segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of HMS-IDAC/UnMicst
(reference: /root/reference, snapshot 2025-02-22):

* residual-UNet probability-map models (legacy + v2 architecture generations,
  reference ``UnMicst.py:29-187`` / ``UnMicst1-5.py:33-237``),
* overlap-tiled whole-slide inference with ramp-window blending
  (reference ``toolbox/PartitionOfImage.py:6-147``), re-architected as a
  device-resident unfold -> batched-forward -> overlap-add fold pipeline,
* TF1 checkpoint ingestion (pure-Python tensor-bundle reader, no TF dep),
* weighted-cross-entropy training (reference ``UnMicst1-5.py:240-579``),
* data/spatial parallelism over a ``jax.sharding.Mesh``.

Everything under :mod:`unmicst_tpu` is new code designed TPU-first; reference
file:line citations in docstrings document behavioral parity, not provenance.
"""

__version__ = "0.1.0"

from unmicst_tpu.core.hp import HParams, ModelBundle, load_model_dir  # noqa: F401
