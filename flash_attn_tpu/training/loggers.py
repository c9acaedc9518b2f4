"""Metric loggers (counterpart of the reference's Lightning logger zoo,
`training/configs/logger/` — wandb/tensorboard/csv/...).

Offline-friendly implementations: stdout, CSV, JSONL, and TensorBoard
(event-file writer, used when `tensorboardX`/`tf` is importable; silently
skipped otherwise — the environment has no network).  `make_loggers`
returns a multiplexer with `.log(step, metrics)` / `.close()`.
"""

from __future__ import annotations

import csv
import json
import time
from pathlib import Path


class StdoutLogger:
    def log(self, step: int, metrics: dict):
        print({"step": step, **metrics}, flush=True)

    def close(self):
        pass


class JSONLLogger:
    def __init__(self, out_dir):
        self.path = Path(out_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")

    def log(self, step: int, metrics: dict):
        rec = {"step": step, "time": time.time(), **metrics}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class CSVLogger:
    def __init__(self, out_dir):
        self.path = Path(out_dir) / "metrics.csv"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a", newline="")
        self._writer = None
        self._fields = None

    def log(self, step: int, metrics: dict):
        rec = {"step": step, **metrics}
        if self._writer is None:
            self._fields = list(rec)
            self._writer = csv.DictWriter(self._f, fieldnames=self._fields,
                                          extrasaction="ignore")
            if self._f.tell() == 0:
                self._writer.writeheader()
        if any(k not in self._fields for k in rec):
            # New metric mid-run: rewrite the file with the union header so
            # every row stays aligned with it (a widened writer alone would
            # emit rows with more columns than the already-written header).
            self._fields = list(dict.fromkeys(self._fields + list(rec)))
            self._f.close()
            old_rows = []
            if self.path.exists():
                with open(self.path, newline="") as f:
                    old_rows = list(csv.DictReader(f))
            self._f = open(self.path, "w", newline="")
            self._writer = csv.DictWriter(self._f, fieldnames=self._fields,
                                          extrasaction="ignore")
            self._writer.writeheader()
            for row in old_rows:
                self._writer.writerow(row)
        self._writer.writerow(rec)
        self._f.flush()

    def close(self):
        self._f.close()


class TensorBoardLogger:
    """Thin event-file writer; requires tensorboardX or tensorflow."""

    def __init__(self, out_dir):
        self._writer = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._writer = SummaryWriter(str(Path(out_dir) / "tb"))
        except ImportError:
            try:
                import tensorflow as tf  # type: ignore

                self._writer = tf.summary.create_file_writer(
                    str(Path(out_dir) / "tb"))
                self._tf = tf
            except ImportError:
                self._writer = None

    @property
    def available(self):
        return self._writer is not None

    def log(self, step: int, metrics: dict):
        if self._writer is None:
            return
        if hasattr(self._writer, "add_scalar"):
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._writer.add_scalar(k, v, step)
        else:
            with self._writer.as_default():
                for k, v in metrics.items():
                    if isinstance(v, (int, float)):
                        self._tf.summary.scalar(k, v, step=step)

    def close(self):
        if self._writer is not None and hasattr(self._writer, "close"):
            self._writer.close()


class WandbLogger:
    """Weights & Biases backend (reference `training/configs/logger/wandb.yaml`).

    Import-gated: if `wandb` is not installed (this environment has no
    network) the logger reports unavailable and `make_loggers` falls back
    to a JSONL logger so the metrics are still captured.
    """

    def __init__(self, out_dir, project="flash-attn-tpu", name=None,
                 config=None):
        self._run = None
        try:
            import wandb  # type: ignore

            self._run = wandb.init(
                project=project, name=name, config=config or {},
                dir=str(out_dir), reinit=True)
        except Exception:
            self._run = None

    @property
    def available(self):
        return self._run is not None

    def log(self, step: int, metrics: dict):
        if self._run is None:
            return
        self._run.log(
            {k: v for k, v in metrics.items()
             if isinstance(v, (int, float))}, step=step)

    def close(self):
        if self._run is not None:
            self._run.finish()


class MLFlowLogger:
    """MLflow backend (reference `training/configs/logger/mlflow.yaml`).

    Import-gated like WandbLogger; uses a local `mlruns` file store when no
    tracking server is configured.
    """

    def __init__(self, out_dir, experiment="flash-attn-tpu", run_name=None):
        self._mlflow = None
        try:
            import mlflow  # type: ignore

            mlflow.set_tracking_uri(f"file:{Path(out_dir) / 'mlruns'}")
            mlflow.set_experiment(experiment)
            self._active = mlflow.start_run(run_name=run_name)
            self._mlflow = mlflow
        except Exception:
            self._mlflow = None

    @property
    def available(self):
        return self._mlflow is not None

    def log(self, step: int, metrics: dict):
        if self._mlflow is None:
            return
        self._mlflow.log_metrics(
            {k.replace("/", "_"): float(v) for k, v in metrics.items()
             if isinstance(v, (int, float))}, step=step)

    def close(self):
        if self._mlflow is not None:
            self._mlflow.end_run()


class LoggerCollection:
    def __init__(self, loggers):
        self.loggers = loggers

    def log(self, step: int, metrics: dict):
        for lg in self.loggers:
            lg.log(step, metrics)

    def close(self):
        for lg in self.loggers:
            lg.close()


def make_loggers(names, out_dir="runs") -> LoggerCollection:
    out = []
    for name in names or ["stdout"]:
        if name == "stdout":
            out.append(StdoutLogger())
        elif name == "jsonl":
            out.append(JSONLLogger(out_dir))
        elif name == "csv":
            out.append(CSVLogger(out_dir))
        elif name in ("tensorboard", "tb"):
            tb = TensorBoardLogger(out_dir)
            if tb.available:
                out.append(tb)
        elif name == "wandb":
            wb = WandbLogger(out_dir)
            out.append(wb if wb.available else JSONLLogger(out_dir))
        elif name == "mlflow":
            ml = MLFlowLogger(out_dir)
            out.append(ml if ml.available else JSONLLogger(out_dir))
        else:
            raise ValueError(f"unknown logger {name!r}")
    return LoggerCollection(out)
