"""Distributed corpus encoding demo (TPU-native surface beyond the
reference): a document stream sharded data-parallel over a device mesh,
tables replicated in HBM, psum'd byte/token counters, piece-safe chunking
for documents larger than a device row, and throughput metering.

Run on CPU with a virtual 8-device mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/distributed_corpus.py
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax  # noqa: E402

# ALWAYS force the cpu platform via jax.config: this image pins
# JAX_PLATFORMS=axon in a way that survives env overrides, so trusting
# the env var silently lands the demo on the (single-chip, tunneled) TPU
# (CLAUDE.md gotcha).  Set TEKKEN_EXAMPLE_PLATFORM to override.
jax.config.update("jax_platforms",
                  os.environ.get("TEKKEN_EXAMPLE_PLATFORM", "cpu"))


def main():
    from tekken_tpu.models import build_synthetic_tokenizer
    from tekken_tpu.oracle import encode_ranks
    from tekken_tpu.parallel.corpus import CorpusEncoder
    from tekken_tpu.parallel.mesh import make_dp_mesh

    n_dev = min(8, len(jax.devices()))
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")

    tok = build_synthetic_tokenizer(num_merges=400, num_special_tokens=20)
    mesh = make_dp_mesh(n_dev)
    enc = CorpusEncoder(tok, mesh=mesh, rows=2 * n_dev, row_len=1024)

    # a small corpus with one document far larger than a device row —
    # it rides the device path via piece-safe chunking
    rng = random.Random(7)
    words = ["hello", "world", "tokenizer", "mesh", "stream", "data"]
    docs = [" ".join(rng.choice(words) for _ in range(30))
            for _ in range(40)]
    docs.insert(3, " ".join(rng.choice(words) for _ in range(3000)))

    got = []
    stats = enc.encode_stream(docs, on_batch=got.extend,
                              add_special_shift=False)
    assert len(got) == len(docs)
    for d, g in zip(docs, got):
        assert g == encode_ranks(d, tok.ranks)

    print(f"documents:  {stats['documents']} "
          f"({stats['oversized_documents']} chunked)")
    print(f"bytes:      {stats['bytes']}")
    print(f"tokens:     {stats['tokens']}")
    print(f"throughput: {stats['bytes_per_sec'] / 1e3:.1f} KB/s "
          f"(tiny corpus on a virtual CPU mesh, compile included)")
    print("parity:     all documents equal the scalar oracle")


if __name__ == "__main__":
    main()
