#!/usr/bin/env python
"""int8 end-task accuracy vs full precision on a TRAINED checkpoint
(VERDICT r3 item 4 / ADVICE r3: the int8 path had numerics tests but no
end-task measurement; ``serve --int8`` changed serving numerics with no
quality gate).

Loads a trained checkpoint (default: the round-5 48-epoch parity rerun's
best-gap model, `runs/parity48_retained` — retained specifically so this gate
measures against a GOOD model, VERDICT r4 weak #2), embeds the ENTIRE
test split both full-precision and int8-quantized (dynamic W8A8 on every
Dense kernel, ``ops/quant.py`` — the ``serve.py --int8`` configuration), and
reports for both:

  * speech→text retrieval Recall@1/5/10, MRR, mean rank over the full test
    pool (the BASELINE.json headline metric), and
  * the clean-vs-corrupt similarity gap in the reference's human-readable
    sigmoid(cos/τ) readout (same corrupted negatives for both precisions —
    seeded corruption, so the comparison isolates quantization).

Writes <checkpoint_dir>/../int8_quality_eval.json and prints a table.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def embed_split(emb, texts, audios, chunk=32):
    te = np.concatenate([emb.embed_texts(texts[i:i + chunk])
                         for i in range(0, len(texts), chunk)])
    ae = np.concatenate([emb.embed_audios(audios[i:i + chunk])
                         for i in range(0, len(audios), chunk)])
    return te, ae


def evaluate(emb, texts, corrupts, audios, temperature):
    from speech_transcript_embeddings_tpu.inference.embed import retrieval_metrics

    te, ae = embed_split(emb, texts, audios)
    tn = np.concatenate([emb.embed_texts(corrupts[i:i + 32])
                         for i in range(0, len(corrupts), 32)])
    s_pos = np.sum(te * ae, axis=1)
    s_neg = np.sum(tn * ae, axis=1)
    hr = lambda s: 1.0 / (1.0 + np.exp(-s / temperature))
    out = retrieval_metrics(ae, te)
    out.update({
        "clean_similarity": float(hr(s_pos).mean()),
        "corrupt_similarity": float(hr(s_neg).mean()),
        "similarity_gap": float(hr(s_pos).mean() - hr(s_neg).mean()),
        "clean_cos": float(s_pos.mean()),
        "corrupt_cos": float(s_neg.mean()),
    })
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint",
                    default="runs/parity48_retained/best_model_gap")
    ap.add_argument("--limit", type=int, default=0,
                    help="cap the test pool (0 = full split)")
    ap.add_argument("--out", default=None,
                    help="output JSON (default <ckpt>/../int8_quality_eval.json)")
    args = ap.parse_args()

    from speech_transcript_embeddings_tpu.utils.compilation_cache import enable
    enable()
    from speech_transcript_embeddings_tpu.data.corruption import (
        create_corrupted_transcript,
    )
    from speech_transcript_embeddings_tpu.data.sources import make_source
    from speech_transcript_embeddings_tpu.inference.embed import Embedder

    emb = Embedder.from_checkpoint(args.checkpoint)
    cfg = emb.cfg
    source = make_source(cfg.data, seed=cfg.train.seed)
    n = source.num_examples("test")
    if args.limit:
        n = min(n, args.limit)
    texts, audios, corrupts = [], [], []
    for i in range(n):
        ex = source.example_at("test", i)
        texts.append(ex.sentence)
        audios.append(ex.audio)
        # seeded per-example corruption → identical negatives for fp and int8
        corrupts.append(create_corrupted_transcript(
            ex.sentence, np.random.default_rng(
                np.random.SeedSequence([cfg.train.seed, 2, i]))))
    print(f"test pool: {n} clips (checkpoint {args.checkpoint})", flush=True)

    fp = evaluate(emb, texts, corrupts, audios, cfg.loss.temperature)
    print("fp  :", json.dumps(fp), flush=True)

    emb_q = Embedder.from_checkpoint(args.checkpoint).quantize_int8()
    q = evaluate(emb_q, texts, corrupts, audios, cfg.loss.temperature)
    print("int8:", json.dumps(q), flush=True)

    delta = {k: round(q[k] - fp[k], 6) for k in fp}
    result = {"checkpoint": args.checkpoint, "pool": n,
              "fp": fp, "int8": q, "delta_int8_minus_fp": delta}
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.checkpoint)),
        "int8_quality_eval.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)

    print(f"\n{'metric':<22}{'fp':>12}{'int8':>12}{'delta':>12}")
    for k in ("recall@1", "recall@5", "recall@10", "mrr", "mean_rank",
              "similarity_gap", "clean_similarity", "corrupt_similarity"):
        print(f"{k:<22}{fp[k]:>12.4f}{q[k]:>12.4f}{q[k] - fp[k]:>12.4f}")
    print(f"\nwritten: {out_path}")


if __name__ == "__main__":
    main()
