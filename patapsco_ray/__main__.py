"""CLI entry point: ``python -m patapsco_ray <config.yml|config.json>``.

Mirrors the reference's ``patapsco config.yml`` command
(/root/reference/patapsco/bin/main.py:8-25) including ``--set
key=value`` config overrides (config.py:409-441).
"""

from __future__ import annotations

import argparse
import json
import sys


def _apply_override(cfg: dict, expr: str) -> None:
    key, _, value = expr.partition("=")
    node = cfg
    parts = key.split(".")
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    try:
        node[parts[-1]] = json.loads(value)
    except json.JSONDecodeError:
        node[parts[-1]] = value


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="patapsco_ray",
        description="Run a config-driven index+retrieve pipeline",
    )
    ap.add_argument("config", help="YAML or JSON config file")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="override a config value (repeatable)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        from .pipelines.runner import Runner, _load_config

        cfg = _load_config(args.config)
        for expr in getattr(args, "set"):
            _apply_override(cfg, expr)
        out = Runner(cfg).run()
        print(json.dumps({k: v for k, v in out.items() if k != "manifest"},
                         indent=1))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
