from . import push_cube, pick_cube, stack_cube, peg_insertion_side, tabletop_simple, cartpole  # noqa: F401
