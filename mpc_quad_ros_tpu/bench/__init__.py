from .parity import replay_reference_log, control_parity_report

__all__ = ["replay_reference_log", "control_parity_report"]
