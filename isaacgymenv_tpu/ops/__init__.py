from isaacgymenv_tpu.ops import maths  # noqa: F401
