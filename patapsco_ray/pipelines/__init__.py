from .runner import ConfigError, Runner, run_pipeline

__all__ = ["ConfigError", "Runner", "run_pipeline"]
