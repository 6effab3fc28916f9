"""Real-pretrained-weights validation — ready to run the day the
environment provides checkpoints (BASELINE.md north star; this image has
no network egress, so it cannot run today — tests/test_golden_parity.py
covers the same code path on locally generated HF fixtures).

Given a checkpoint dir, runs the full validation ladder:
  1. import      HF (config.json + *.safetensors) or native (meta.json)
  2. golden      our logits vs transformers' on fixed prompts (HF dirs
                 only, torch CPU) — max|d| and argmax agreement
  3. ppl         WikiText-2-protocol sliding-window perplexity, FP16/bf16
                 vs W4A16 g128 (the OmniQuant table: llama2-7b 5.47 fp16
                 -> 5.58 w4a16g128; delta <= ~0.15 expected)
  4. decode      bs8 1024-ctx W4 decode tok/s on the chip (bench.py
                 protocol, real weights)

Usage:
  python exps/verify_real_weights.py /path/to/ckpt \
      [--text /path/to/wikitext2.txt] [--no-golden] [--no-decode] \
      [--max-windows 8]

Expected outputs (TinyLlama-1.1B): golden max|d| <= 2e-2 bf16 (2e-4 fp32),
argmax agreement >= 99%; ppl ~7.7 fp16 / <= +0.2 W4; decode within 5% of
the synthetic-weights headline (weights stream identically — values don't
change the byte count).

Reference roles: meta.py:80-214 (from_pretrained), light-eval ppl
protocol, OmniQuant ppl table (BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

# honor JAX_PLATFORMS=cpu explicitly: the axon sitecustomize pins
# jax_platforms="axon,cpu" via jax.config, which silently overrides the
# env var (see tests/conftest.py) — without this a "CPU" run grabs the
# tunneled TPU and pays remote compiles
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

FALLBACK_TEXT = (
    "The Transformer architecture has become the dominant approach in "
    "natural language processing . It relies entirely on attention "
    "mechanisms , dispensing with recurrence and convolutions . ") * 200


def detect_format(path):
    if os.path.exists(os.path.join(path, "meta.json")):
        return "native"
    if os.path.exists(os.path.join(path, "config.json")):
        cfg = json.load(open(os.path.join(path, "config.json")))
        if cfg.get("model_type", "llama") == "llama":
            return "hf"
    raise SystemExit(f"{path}: neither meta.json (native) nor a llama "
                     f"config.json (HF) found")


def load_hf(path, max_seq_len):
    """HF dir -> MetaModel (convert_hf_to_ours + tokenizer probe)."""
    import jax
    import jax.numpy as jnp

    from accessory_tpu.meta import MetaModel
    from accessory_tpu.tools.convert_weights_to_hf import convert_hf_to_ours

    cfg = json.load(open(os.path.join(path, "config.json")))
    largs = {
        "dim": cfg["hidden_size"], "n_layers": cfg["num_hidden_layers"],
        "n_heads": cfg["num_attention_heads"],
        "n_kv_heads": cfg.get("num_key_value_heads",
                              cfg["num_attention_heads"]),
        "vocab_size": cfg["vocab_size"],
        "multiple_of": 1, "ffn_dim_multiplier": None,
        "norm_eps": cfg.get("rms_norm_eps", 1e-5),
        "rope_theta": cfg.get("rope_theta", 10000.0),
        "dtype": "bfloat16",
    }
    # ffn dim comes straight from the checkpoint; pin it via multiple_of
    largs["multiple_of"] = cfg["intermediate_size"]
    # our init computes hidden = multiple_of * ceil(8d/3 / multiple_of);
    # with multiple_of == intermediate_size that's >= 1 multiple -> exact
    # only when 8d/3 <= intermediate_size; assert after init instead.

    tok = None
    for cand in ("tokenizer.json", "tokenizer.model"):
        if os.path.exists(os.path.join(path, cand)):
            tok = os.path.join(path, cand)
            break
    if tok is None:
        raise SystemExit(f"no tokenizer.{{json,model}} in {path}")

    import tempfile

    cfg_file = os.path.join(tempfile.mkdtemp(), "config.json")
    with open(cfg_file, "w") as f:
        json.dump(largs, f)
    model = MetaModel("llama", [cfg_file], tokenizer_path=tok,
                      max_seq_len=max_seq_len, init_params=True)
    flat = convert_hf_to_ours(path, n_heads=largs["n_heads"],
                              n_kv_heads=largs["n_kv_heads"])

    def ins(tree, ks, v):
        for k in ks[:-1]:
            tree = tree[k]
        tree[ks[-1]] = jnp.asarray(v).astype(jnp.bfloat16)

    for k, v in flat.items():
        ins(model.params, k.split("/"), v)
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--text", default=None,
                    help="WikiText-2 (or any) raw text file for ppl")
    ap.add_argument("--no-golden", action="store_true")
    ap.add_argument("--no-decode", action="store_true")
    ap.add_argument("--max-windows", type=int, default=8)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    fmt = detect_format(a.ckpt)
    print(f"[1/4] import ({fmt}) ...", flush=True)
    if fmt == "hf":
        model = load_hf(a.ckpt, a.max_seq_len)
    else:
        from accessory_tpu.meta import MetaModel
        model = MetaModel.from_pretrained(a.ckpt,
                                          max_seq_len=a.max_seq_len)
    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree.leaves(model.params) if hasattr(x, "shape"))
    print(f"      {n_params/1e9:.2f}B params imported"
          if n_params >= 1e8 else
          f"      {n_params/1e6:.1f}M params imported", flush=True)

    prompts = ["The capital of France is",
               "def fibonacci(n):",
               "Once upon a time"]

    if fmt == "hf" and not a.no_golden:
        print("[2/4] golden logits vs transformers (torch CPU) ...",
              flush=True)
        try:
            import torch
            from transformers import AutoModelForCausalLM

            hf = AutoModelForCausalLM.from_pretrained(
                a.ckpt, torch_dtype=torch.float32)
            hf.eval()
            agree, maxd = [], 0.0
            for p in prompts:
                ids = model.tokenizer.encode(p, bos=True, eos=False)
                ours = np.asarray(model.compute_logits(
                    jnp.asarray([ids], jnp.int32)), np.float32)[0]
                with torch.no_grad():
                    theirs = hf(torch.tensor([ids])).logits[0].numpy()
                maxd = max(maxd, float(np.abs(ours - theirs).max()))
                agree.append(float((ours.argmax(-1)
                                    == theirs.argmax(-1)).mean()))
            print(f"      max|d|={maxd:.4f}  argmax agreement="
                  f"{np.mean(agree)*100:.1f}%  "
                  f"({'OK' if np.mean(agree) > 0.98 else 'CHECK'})",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"      skipped ({type(e).__name__}: {str(e)[:100]})",
                  flush=True)
    else:
        print("[2/4] golden logits: skipped", flush=True)

    print("[3/4] perplexity FP vs W4A16 g128 ...", flush=True)
    from accessory_tpu.eval.harness import perplexity

    text = (open(a.text).read() if a.text else FALLBACK_TEXT)
    tag = "wikitext-2" if a.text else "FALLBACK-text (pass --text for wt2)"
    t0 = time.time()
    ppl_fp = perplexity(model, text, seq_len=min(2048, a.max_seq_len),
                        max_windows=a.max_windows)
    model.quantize(bits=4, group_size=128)
    nq = sum(1 for x in jax.tree.leaves(
        model.params, is_leaf=lambda x: hasattr(x, "packed"))
        if hasattr(x, "packed"))
    ppl_w4 = perplexity(model, text, seq_len=min(2048, a.max_seq_len),
                        max_windows=a.max_windows)
    print(f"      {tag}: fp {ppl_fp:.3f} -> w4 {ppl_w4:.3f} "
          f"(delta {ppl_w4-ppl_fp:+.3f} over {nq} quantized leaves; "
          f"OmniQuant-table expectation <= ~0.15 on llama2-7b)  "
          f"[{time.time()-t0:.0f}s]", flush=True)
    if nq == 0:
        print("      NOTE: no leaf met the group-128 quantization shape "
              "bar (fixture-scale models) — delta is trivially 0",
              flush=True)

    if not a.no_decode:
        print("[4/4] W4 decode bench (bs8, 1024 ctx) ...", flush=True)
        gen = model.generator
        outs = gen.generate(["The meaning of life is"] * 8,
                            max_gen_len=16)  # warm + sanity
        t0 = time.time()
        outs = gen.generate(["The meaning of life is"] * 8,
                            max_gen_len=64)
        dt = time.time() - t0
        print(f"      {8*64/dt:.0f} tok/s generate-API throughput "
              f"(see bench.py for the steady-state kernel number); "
              f"sample: {outs[0][:60]!r}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
