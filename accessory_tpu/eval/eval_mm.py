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


_BOX_RE = re.compile(r"\[?\(?(\d+\.?\d*)[,;\s]+(\d+\.?\d*)[,;\s]+"
                     r"(\d+\.?\d*)[,;\s]+(\d+\.?\d*)\)?\]?")


def extract_box(text: str):
    """Parse the first (x1, y1, x2, y2) box from a generation."""
    m = _BOX_RE.search(text)
    return tuple(float(g) for g in m.groups()) if m else None


def box_iou(a, b) -> float:
    """IoU of two (x1, y1, x2, y2) boxes (refcoco grounding metric)."""
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
    area = lambda r: max(r[2] - r[0], 0.0) * max(r[3] - r[1], 0.0)  # noqa: E731
    union = area(a) + area(b) - inter
    return inter / union if union > 0 else 0.0


def evaluate_refcoco(model, items: Iterable[Dict], image_root: str = "",
                     batch_size: int = 8, iou_thresh: float = 0.5) -> Dict:
    """refcoco-style grounding: generate a box for each referring expression
    and score acc@IoU>=0.5 (reference accessory/eval_mm refcoco driver).
    items: {"image", "expression"|"question", "bbox": [x1, y1, x2, y2]}."""
    from PIL import Image

    from accessory_tpu.data.conversation import default_conversation
    from accessory_tpu.data.transform import padded_resize

    items = list(items)
    size = getattr(model.args, "image_size", 224)
    correct = 0
    for i in range(0, len(items), batch_size):
        batch = items[i: i + batch_size]
        prompts, imgs = [], []
        for it in batch:
            q = it.get("expression") or it["question"]
            conv = default_conversation()
            conv.load_qas([[f"Please provide the bounding box for: {q}", None]])
            prompts.append(conv.get_prompt())
            imgs.append(padded_resize(
                Image.open(f"{image_root}{it['image']}").convert("RGB"), size))
        import numpy as np

        conv = default_conversation()
        outs = model.generate(
            prompts, images=np.stack(imgs), max_gen_len=32,
            additional_stop_symbols=(conv.response_end_signal,))
        for it, out in zip(batch, outs):
            pred = extract_box(out)
            if pred is not None and box_iou(pred, tuple(it["bbox"])) >= iou_thresh:
                correct += 1
    return {"accuracy": correct / max(len(items), 1), "total": len(items)}


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
