from neural_magic_vllm_tpu.spec_decode.ngram import NGramProposer
from neural_magic_vllm_tpu.spec_decode.rejection import (
    rejection_sample_greedy, rejection_sample_onehot)

__all__ = ["NGramProposer", "rejection_sample_greedy",
           "rejection_sample_onehot"]
