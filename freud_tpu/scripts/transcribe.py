"""Batch transcription CLI.

The reference exposes transcription only through the GUI/manipulation paths
(a single greedy ``model.decode`` per request, src/models/hooked_model.py:
103-110); this CLI is the standalone decode surface over a folder of audio:
batched fixed-shape decoding with optional beam search and whisper.transcribe's
temperature-fallback ladder (models/whisper/decoding.py, runtime.py).

Usage:
  python -m freud_tpu.scripts.transcribe --data_path DIR [--model tiny]
      [--batch_size 8] [--language en] [--beam_size 5] [--fallback]
      [--max_new_tokens 224] [--precision float32|bfloat16] [--out out.json]
      [--output_format txt|srt|vtt|tsv|json --output_dir D]  (subtitle
      formats render --long's timed segments — models/whisper/writers.py)

Every batch is padded to ``batch_size`` files so the decode compiles exactly
once per run (ragged tails would re-trace; a remote TPU compile is minutes).
"""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np

from ..data.audio_dataset import AudioBatchPipeline
from ..models.whisper.runtime import WhisperRuntime


def transcribe_folder(
    data_path: str,
    model: str = "tiny",
    batch_size: int = 8,
    language: str | None = None,
    task: str = "transcribe",
    beam_size: int | None = None,
    fallback: bool = False,
    max_new_tokens: int = 224,
    precision: str = "float32",
    word_timestamps: bool = False,
    verbose: bool = True,
) -> dict:
    """→ {file path: transcript} — or, with ``word_timestamps``,
    {file path: {"text", "words": [{"word", "start", "end"}, …]}} — for every
    decodable audio file under ``data_path`` (undecodable files degrade to a
    per-file error marker, matching the collection pipeline's policy)."""
    if word_timestamps and (beam_size or fallback):
        raise SystemExit(
            "--word_timestamps uses the greedy alignment path and cannot "
            "combine with --beam_size/--fallback in batch mode (use --long, "
            "whose per-window ladder composes with word timestamps)"
        )
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    rt = WhisperRuntime(
        model, compute_dtype=compute_dtype, max_new_tokens=max_new_tokens,
        language=language, task=task,
    )
    pipeline = AudioBatchPipeline(
        data_path, batch_size, rt.dims.n_mels, drop_last=False
    )
    out: dict[str, str] = {}
    for mels, files, lengths in pipeline:
        mels = np.asarray(mels)
        n = len(files)
        if n < batch_size:  # pad the tail batch: one compiled shape per run
            mels = np.concatenate(
                [mels, np.repeat(mels[-1:], batch_size - n, axis=0)], axis=0
            )
        words = None
        if word_timestamps:
            from ..analysis.features import activation_length_from_samples

            n_frames = np.array(
                [activation_length_from_samples(max(int(ln), 0))
                 for ln in lengths]
                + [1500] * (batch_size - n)
            )
            texts, words = rt.transcribe_with_word_timestamps(
                jnp.asarray(mels), num_frames=n_frames)
        elif fallback or beam_size:
            texts = rt.transcribe_with_fallback(
                jnp.asarray(mels), beam_size=beam_size,
                temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0) if fallback
                else (0.0,),
            )
        else:
            texts = rt.transcribe(jnp.asarray(mels))
        for j, (f, t, ln) in enumerate(zip(files, texts, lengths)):
            if ln < 0:
                out[f] = "<decode-failed>"
            elif words is not None:
                out[f] = {"text": t, "words": words[j]}
            else:
                out[f] = t
            if verbose:
                print(json.dumps({"file": f, "result": out[f]}))
    return out


def transcribe_folder_long(
    data_path: str,
    model: str = "tiny",
    language: str | None = None,
    max_new_tokens: int = 224,
    precision: str = "float32",
    verbose: bool = True,
    beam_size: int | None = None,
    word_timestamps: bool = False,
    task: str = "transcribe",
    clip_timestamps: str = "0",
    hallucination_silence_threshold: float | None = None,
    initial_prompt: str | None = None,
    carry_initial_prompt: bool = False,
) -> dict:
    """→ {file: {"text", "segments"}} via the 30-s seek loop — files of any
    duration, each decoded window at a fixed compiled shape through the
    per-window temperature-fallback ladder (``beam_size`` switches the t=0
    rung to beam search, whisper.transcribe's quality path;
    ``word_timestamps`` adds per-word times to every segment)."""
    from ..audio.decode import load_audio
    from ..data.audio_dataset import list_audio_files

    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    rt = WhisperRuntime(
        model, compute_dtype=compute_dtype, max_new_tokens=max_new_tokens,
        language=language, task=task,
    )
    out: dict = {}
    for f in list_audio_files(data_path):
        try:
            audio = load_audio(f)
        except RuntimeError:
            out[f] = "<decode-failed>"
            continue
        out[f] = rt.transcribe_long(
            audio, beam_size=beam_size, word_timestamps=word_timestamps,
            clip_timestamps=clip_timestamps,
            hallucination_silence_threshold=hallucination_silence_threshold,
            initial_prompt=initial_prompt,
            carry_initial_prompt=carry_initial_prompt)
        if verbose:
            print(json.dumps({"file": f, "result": out[f]}))
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--language", default=None)
    ap.add_argument("--task", default="transcribe",
                    choices=("transcribe", "translate"),
                    help="whisper DecodingOptions.task")
    ap.add_argument("--beam_size", type=int, default=None)
    ap.add_argument("--fallback", action="store_true",
                    help="temperature-fallback ladder (whisper.transcribe)")
    ap.add_argument("--max_new_tokens", type=int, default=224)
    ap.add_argument("--precision", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--word_timestamps", action="store_true",
                    help="cross-attention DTW word timings per file")
    ap.add_argument("--long", action="store_true",
                    help="30-s seek loop for arbitrary-length audio "
                         "(whisper.transcribe); yields timed segments")
    ap.add_argument("--clip_timestamps", default="0",
                    help="whisper's clip option: 'start,end,start,end,…' "
                         "seconds; transcribe only these ranges (--long)")
    ap.add_argument("--initial_prompt", default=None,
                    help="text to condition the first window on (whisper's "
                         "option; --long, needs tokenizer assets)")
    ap.add_argument("--carry_initial_prompt", action="store_true",
                    help="re-prefix --initial_prompt onto EVERY window's "
                         "conditioning (whisper's option)")
    ap.add_argument("--hallucination_silence_threshold", type=float,
                    default=None,
                    help="whisper's option: with --long --word_timestamps, "
                         "skip silent gaps longer than this (seconds) when "
                         "an anomalous (probable-hallucination) segment is "
                         "detected")
    ap.add_argument("--out", default=None, help="write {file: text} JSON here")
    ap.add_argument("--output_format", default=None,
                    choices=["txt", "srt", "vtt", "tsv", "json"],
                    help="per-file transcript files (whisper-CLI formats; "
                         "srt/vtt/tsv need --long's timed segments)")
    ap.add_argument("--output_dir", default=".",
                    help="directory for --output_format files")
    ap.add_argument("--max_line_width", type=int, default=None,
                    help="srt/vtt: break subtitle lines at this many chars "
                         "(word-boundary cues; needs --word_timestamps)")
    ap.add_argument("--max_line_count", type=int, default=None,
                    help="srt/vtt: max lines per subtitle cue")
    ap.add_argument("--highlight_words", action="store_true",
                    help="srt/vtt: one cue per word with the current word "
                         "underlined (karaoke; needs --word_timestamps)")
    args = ap.parse_args()

    if args.output_format in ("srt", "vtt", "tsv") and not args.long:
        ap.error(f"--output_format {args.output_format} needs the timed "
                 "segments of --long")

    if args.long:
        result = transcribe_folder_long(
            args.data_path, args.model, args.language, args.max_new_tokens,
            args.precision, beam_size=args.beam_size,
            word_timestamps=args.word_timestamps, task=args.task,
            clip_timestamps=args.clip_timestamps,
            hallucination_silence_threshold=(
                args.hallucination_silence_threshold),
            initial_prompt=args.initial_prompt,
            carry_initial_prompt=args.carry_initial_prompt,
        )
    else:
        result = transcribe_folder(
            args.data_path, args.model, args.batch_size, args.language,
            args.task, args.beam_size, args.fallback, args.max_new_tokens,
            args.precision, args.word_timestamps,
        )
    if args.output_format:
        from ..models.whisper.writers import write_result

        for path, res in result.items():
            if not isinstance(res, dict):  # batch mode / decode failures
                res = {"text": res if isinstance(res, str) else str(res)}
            write_result(res, path, args.output_dir, args.output_format,
                         max_line_width=args.max_line_width,
                         max_line_count=args.max_line_count,
                         highlight_words=args.highlight_words)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
