from ctdirect_tpu.parallel.batch import BatchSolver, make_batch_solver

__all__ = ["BatchSolver", "make_batch_solver"]
