from .banded_solve import solve_factorized_pallas

__all__ = ["solve_factorized_pallas"]
