from .scaling import scaling_sweep

__all__ = ["scaling_sweep"]
