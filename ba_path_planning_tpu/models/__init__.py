from .double_integrator import DoubleIntegrator2D

__all__ = ["DoubleIntegrator2D"]
