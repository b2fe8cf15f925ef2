from tpu_smatcher.utils.profiling import PhaseTimer, time_jit, trace, emit_jsonl
from tpu_smatcher.utils.debug import dprint

__all__ = ["PhaseTimer", "time_jit", "trace", "emit_jsonl", "dprint"]
