"""Speculative decoding metrics (reference vllm/spec_decode/metrics.py ->
SamplerOutput.spec_decode_worker_metrics -> stat logger)."""
from dataclasses import dataclass


@dataclass
class SpecDecodeWorkerMetrics:
    """Cumulative acceptance statistics."""
    num_spec_tokens: int = 0      # proposed draft tokens
    accepted_tokens: int = 0      # drafts accepted by rejection sampling
    emitted_tokens: int = 0       # total tokens emitted via spec path
    num_steps: int = 0

    @property
    def draft_acceptance_rate(self) -> float:
        return self.accepted_tokens / max(self.num_spec_tokens, 1)

    @property
    def system_efficiency(self) -> float:
        """emitted per step / (k+1) ideal."""
        return self.emitted_tokens / max(self.num_steps, 1)
