from .admm import QPData, QPState, solve_qp, build_static_normal_inverse

__all__ = ["QPData", "QPState", "solve_qp", "build_static_normal_inverse"]
