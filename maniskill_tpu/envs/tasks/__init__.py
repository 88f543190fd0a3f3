from . import push_cube, pick_cube, cartpole  # noqa: F401
