"""Evaluation CLI driver (light-eval equivalent).

Reference: light-eval/src/eval_mmlu.py:82-107 etc. — builds the model,
reads the benchmark's data files, runs the matching primitive, prints
accuracy / perplexity.

Tasks:
  ppl   --data file.txt                 sliding-window perplexity
  mmlu  --data dir/ (HF-style csv: question,A,B,C,D,answer)
  gsm8k --data file.jsonl (fields: question, answer)

Run: python -m accessory_tpu.eval.run_eval --task ppl --data wiki.txt \
       --pretrained_path ckpt/ [--quant]
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os


def get_args_parser():
    p = argparse.ArgumentParser("evaluation", add_help=False)
    p.add_argument("--task", required=True,
                   choices=["ppl", "mmlu", "gsm8k", "bbh", "math",
                            "humaneval", "ceval", "cmmlu"])
    p.add_argument("--n_samples", default=1, type=int,
                   help="humaneval samples per task (pass@k needs n >= k)")
    p.add_argument("--ntrain", default=5, type=int,
                   help="few-shot examples (ceval/cmmlu)")
    p.add_argument("--data", required=True, type=str)
    p.add_argument("--pretrained_path", required=True, type=str)
    p.add_argument("--llama_type", default=None, type=str)
    p.add_argument("--max_seq_len", default=2048, type=int)
    p.add_argument("--seq_len", default=2048, type=int, help="ppl window")
    p.add_argument("--quant", action="store_true")
    p.add_argument("--limit", default=None, type=int)
    return p


def load_mmlu_csvs(path: str, limit=None):
    items = []
    files = sorted(glob.glob(os.path.join(path, "*.csv"))) if os.path.isdir(path) else [path]
    for f in files:
        with open(f) as fh:
            for row in csv.reader(fh):
                if len(row) < 6:
                    continue
                q, a, b, c, d, ans = row[:6]
                items.append({"question": q, "choices": [a, b, c, d],
                              "answer": ans})
                if limit and len(items) >= limit:
                    return items
    return items


def load_jsonl(path: str, limit=None):
    items = []
    with open(path) as f:
        for line in f:
            items.append(json.loads(line))
            if limit and len(items) >= limit:
                break
    return items


def main(args) -> None:
    from accessory_tpu.eval import generation_eval, multiple_choice, perplexity
    from accessory_tpu.meta import MetaModel

    model = MetaModel.from_pretrained(
        args.pretrained_path, llama_type=args.llama_type,
        max_seq_len=args.max_seq_len, quant=args.quant)

    if args.task == "ppl":
        with open(args.data) as f:
            text = f.read()
        ppl = perplexity(model, text, seq_len=args.seq_len,
                         max_windows=args.limit)
        print(json.dumps({"task": "ppl", "ppl": ppl}))
    elif args.task == "mmlu":
        items = load_mmlu_csvs(args.data, args.limit)
        res = multiple_choice(model, items)
        print(json.dumps({"task": "mmlu", **res}))
    elif args.task == "gsm8k":
        items = load_jsonl(args.data, args.limit)
        res = generation_eval(
            model, items,
            prompt_fn=lambda x: f"Question: {x['question']}\nAnswer:",
            target_fn=lambda x: str(x["answer"]).split("####")[-1].strip(),
            stop_symbols=("Question:",))
        print(json.dumps({"task": "gsm8k", **res}))
    elif args.task == "bbh":
        from accessory_tpu.eval.tasks import eval_bbh
        res = eval_bbh(model, args.data, limit=args.limit)
        print(json.dumps({"task": "bbh", **res}))
    elif args.task == "math":
        from accessory_tpu.eval.tasks import eval_math
        res = eval_math(model, args.data, limit=args.limit)
        print(json.dumps({"task": "math", **res}))
    elif args.task == "humaneval":
        from accessory_tpu.eval.tasks import eval_humaneval
        res = eval_humaneval(model, args.data, n_samples=args.n_samples,
                             limit=args.limit)
        print(json.dumps({"task": "humaneval", **res}))
    elif args.task == "ceval":
        from accessory_tpu.eval.tasks import eval_ceval
        res = eval_ceval(model, args.data, ntrain=args.ntrain,
                         limit=args.limit)
        print(json.dumps({"task": "ceval", **res}))
    elif args.task == "cmmlu":
        from accessory_tpu.eval.tasks import eval_cmmlu
        res = eval_cmmlu(model, args.data, ntrain=args.ntrain,
                         limit=args.limit)
        print(json.dumps({"task": "cmmlu", **res}))


if __name__ == "__main__":
    main(get_args_parser().parse_args())
