from .runner import Runner, run_pipeline

__all__ = ["Runner", "run_pipeline"]
