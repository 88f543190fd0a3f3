from . import push_cube, pick_cube, stack_cube, peg_insertion_side, tabletop_simple, push_t, cartpole, rotate_cube, draw, benchmarks, articulated, control_suite, pick_single_object  # noqa: F401
