"""Device-side ops: the XLA compute path.

- ``pretokenize``: the hardcoded Tekken regex compiled to closed-form
  piece-boundary rules over byte/char classes (gather-free: shifts + native
  cumulative scans).  North star: "regex splitter -> DFA scan kernel".
- ``packed``: the production encode kernel — device-side piece packing,
  whole-piece fast path, compact-shift BPE merge rounds against the
  HBM-replicated cuckoo pair table.
- ``bpe``: merge-round kernels (bucketed argmin variants) + probe
  primitives.  North star: "sequential merge loop -> parallel pair-rank
  argmin scan; HashMap rank lookup -> hash-in-HBM gather".
- ``flat``: flat-buffer merge with segmented scans (reference/testing path).
- ``encode``: host-bucketed batched pipeline (testing path).
- ``decode``: batched token -> byte-span gathers.
- ``mel``: batched STFT + mel filter bank as XLA FFT + MXU matmul.
- ``resample``: polyphase resampling as an XLA conv.
"""
