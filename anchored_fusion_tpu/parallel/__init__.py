"""Device-mesh parallelism: sharded alignment, collective evidence merge."""

from anchored_fusion_tpu.parallel.mesh import make_mesh  # noqa: F401
