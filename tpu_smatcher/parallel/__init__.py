from tpu_smatcher.parallel.mesh import make_mesh, shard_text
from tpu_smatcher.parallel.dist import DistributedCounter

__all__ = ["make_mesh", "shard_text", "DistributedCounter"]
