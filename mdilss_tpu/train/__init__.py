from . import masks, optim, steps

__all__ = ["masks", "optim", "steps"]
