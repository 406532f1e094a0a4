from flashinfer_tpu.scheduler.plan import (
    AttentionPlan,
    plan_attention,
    plan_decode,
    plan_prefill,
)

__all__ = ["AttentionPlan", "plan_attention", "plan_prefill", "plan_decode"]
