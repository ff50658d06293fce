"""Optional Weights & Biases mirroring (`recbole/utils/wandblogger.py:1-68`).

No-ops cleanly when wandb is unavailable or `log_wandb` is off (this
environment has no egress)."""

from __future__ import annotations


class WandbLogger:
    def __init__(self, config):
        self.config = config
        self.log_wandb = bool(config.get("log_wandb", False))
        self.setup_complete = False
        self._wandb = None
        if self.log_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(
                    project=config.get("wandb_project", "oovrec_tpu"),
                    config=config.as_dict() if hasattr(config, "as_dict") else dict(config),
                )
                self.setup_complete = True
            except Exception:
                self.log_wandb = False

    def log_metrics(self, metrics, head: str = "train") -> None:
        if not self.setup_complete:
            return
        payload = {
            (f"{head}/{k}" if head else k): v
            for k, v in metrics.items()
            if isinstance(v, (int, float))
        }
        self._wandb.log(payload)

    def log_eval_metrics(self, metrics, head: str = "eval") -> None:
        self.log_metrics(metrics, head)

    def log_raw(self, payload: dict, commit: bool = True) -> None:
        """Uncoerced wandb.log passthrough (string values allowed — the
        reference logs `file_backup_medium: 'gcs'|'nfs'|'local'` this way,
        `src/run_recbole.py:130,143,159`)."""
        if self.setup_complete:
            self._wandb.log(payload, commit=commit)

    def alert(self, title: str, text: str) -> None:
        if self.setup_complete:
            self._wandb.alert(title=title, text=text)
