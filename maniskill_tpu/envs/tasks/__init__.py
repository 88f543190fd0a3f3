from . import push_cube, pick_cube  # noqa: F401
