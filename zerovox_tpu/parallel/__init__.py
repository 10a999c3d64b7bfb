from zerovox_tpu.parallel.mesh import MeshConfig, make_mesh, shard_batch, replicate

__all__ = ["MeshConfig", "make_mesh", "shard_batch", "replicate"]
