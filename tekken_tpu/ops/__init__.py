"""Device-side ops: the XLA/Pallas compute path.

- ``pretokenize``: vectorized byte-class segmentation of the hardcoded Tekken
  regex (north star: "regex splitter -> DFA scan kernel")
- ``bpe``: the BPE merge loop over padded piece lanes
  (north star: "sequential merge loop -> parallel pair-rank argmin scan")
- ``encode``: end-to-end batched encode pipeline
- ``mel``: batched STFT + mel filter bank as XLA FFT+matmul
- ``resample``: polyphase resampling as an XLA conv
"""
