"""N-gram (prompt-lookup) draft proposer (reference
vllm/spec_decode/ngram_worker.py:13): find the longest recent n-gram that
also occurs earlier in the sequence and propose the k tokens that followed
that earlier occurrence. Pure host-side — no draft model, no extra device
work, so acceptance is free throughput."""
from typing import List, Optional

import numpy as np


class NGramProposer:

    def __init__(self, ngram_max: int, ngram_min: int, k: int) -> None:
        self.ngram_max = max(ngram_max, 1)
        self.ngram_min = max(ngram_min, 1)
        self.k = k

    def propose(self, token_ids: List[int]) -> Optional[List[int]]:
        """Returns k proposed token ids, or None if no n-gram match."""
        L = len(token_ids)
        if L < self.ngram_min + 1:
            return None
        arr = np.asarray(token_ids, dtype=np.int64)
        for n in range(min(self.ngram_max, L - 1), self.ngram_min - 1, -1):
            tail = arr[L - n:]
            # search for the most recent earlier occurrence of `tail`
            # (excluding the tail itself)
            windows = np.lib.stride_tricks.sliding_window_view(
                arr[:L - 1], n)
            hits = np.nonzero((windows == tail).all(axis=1))[0]
            if len(hits) == 0:
                continue
            start = int(hits[-1]) + n  # continuation index
            proposal = arr[start:start + self.k]
            if len(proposal) == 0:
                continue
            out = proposal.tolist()
            # pad short matches by repeating the last token is wrong;
            # just truncate the speculation window instead
            return out
        return None
