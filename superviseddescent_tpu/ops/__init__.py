from superviseddescent_tpu.ops.solver import solve_ridge_normal_equations

__all__ = ["solve_ridge_normal_equations"]
