from .shard import make_mesh, make_sharded_trace_fn, pad_rays_to, shard_ray_batch  # noqa: F401
