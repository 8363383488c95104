from navierstokes_tpu.utils.profiling import EventLog, event_log

__all__ = ["EventLog", "event_log"]
