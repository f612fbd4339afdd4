"""CLI entry point — `python -m climate_tpu.cli.main [overrides...]`.

Config surface parity with the reference (`python main_*.py key=value`,
commands.md:2-4): dotted overrides, group swaps (data=default,
model=SimpleCNN), ckpt_path resume, eval-only via trainer.max_epochs=0.
One entry point replaces the reference's three main scripts; the data
config's `pipeline` key selects baseline/ensemble/final semantics.
"""

from __future__ import annotations

import os
import sys

from ..config.loader import compose, to_yaml
from ..utils.logging import get_logger

log = get_logger("climate_tpu")

DEFAULT_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "configs")


def main(argv: list[str] | None = None) -> dict:
    argv = sys.argv[1:] if argv is None else argv
    config_dir = os.environ.get("CLIMATE_TPU_CONFIG_DIR", DEFAULT_CONFIG_DIR)
    cfg = compose(config_dir, overrides=argv)
    log.info(f"Config:\n{to_yaml(cfg)}")

    # Honor trainer.accelerator before the backend initializes (the ambient
    # env pins JAX_PLATFORMS=axon; jax.config wins over it).
    accel = cfg.get("trainer", {}).get("accelerator", "tpu")
    if accel == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..train.experiment import Experiment

    exp = Experiment(cfg)
    if int(cfg.get("trainer", {}).get("max_epochs", 1)) > 0:
        exp.fit()
        log.info("Training finished.")
    test_metrics = exp.test()
    exp.metrics_logger.finish()
    return test_metrics


if __name__ == "__main__":
    main()
