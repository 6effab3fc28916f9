"""Interactive terminal chat demo: single- or multi-model, text or image.

Reference: accessory/demos/single_model_cli.py (text chat) and
multi_model_cli.py (image + instruction loop); the gradio multi_turn*
demos' model-compare role is covered by passing several --pretrained_path
values — every model answers each prompt side by side.

Run:  python -m accessory_tpu.demos.cli --pretrained_path ckpt/
      python -m accessory_tpu.demos.cli --pretrained_path a/ b/   (compare)
      ... --image photo.jpg          (or '/image photo.jpg' mid-chat)
"""

from __future__ import annotations

import argparse


def get_args_parser():
    p = argparse.ArgumentParser("cli demo", add_help=False)
    p.add_argument("--pretrained_path", required=True, type=str, nargs="+",
                   help="one checkpoint dir per model; several = compare")
    p.add_argument("--llama_type", default=None, type=str)
    p.add_argument("--max_seq_len", default=2048, type=int)
    p.add_argument("--max_gen_len", default=256, type=int)
    p.add_argument("--temperature", default=0.1, type=float)
    p.add_argument("--top_p", default=0.75, type=float)
    p.add_argument("--quant", action="store_true")
    p.add_argument("--quant_bits", default=4, type=int, choices=(3, 4, 8))
    p.add_argument("--kv_dtype", default=None, choices=(None, "int8"),
                   help="int8: quantized KV cache (2x context per GB)")
    p.add_argument("--image", default=None, type=str,
                   help="start the session with this image attached")
    return p


def _load_image(path: str, model):
    """PIL image -> (1, 3, H, W) array at the model's native resolution
    (padded_resize, the reference demos' transform_type)."""
    import numpy as np
    from PIL import Image

    from accessory_tpu.data.transform import get_transform

    size = getattr(model.args, "image_size", 224)
    tr = get_transform("padded_resize", size)
    img = tr(Image.open(path).convert("RGB"))
    return np.asarray(img)[None]


def _answer(model, prompt: str, images, a, stops=()) -> str:
    shown = ""
    for chunk in model.stream_generate(
            prompt, images=images, max_gen_len=a.max_gen_len,
            temperature=a.temperature, top_p=a.top_p,
            additional_stop_symbols=tuple(stops)):
        text = chunk["text"]
        print(text[len(shown):], end="", flush=True)
        shown = text
        if chunk["end_of_content"]:
            break
    print()
    return shown


def main(args) -> None:
    from accessory_tpu.data.conversation import default_conversation
    from accessory_tpu.meta import MetaModel

    models = []
    for path in args.pretrained_path:
        m = MetaModel.from_pretrained(
            path, llama_type=args.llama_type,
            max_seq_len=args.max_seq_len, quant=args.quant,
            quant_bits=args.quant_bits, kv_dtype=args.kv_dtype)
        models.append((path, m))

    image = _load_image(args.image, models[0][1]) if args.image else None
    # per-model history: compared models build on their own answers
    qas = {path: [] for path, _ in models}
    print("(empty line to quit; '/reset' clears history; "
          "'/image <path>' attaches an image to the next turn)")
    while True:
        try:
            q = input("user: ").strip()
        except EOFError:
            break
        if not q:
            break
        if q == "/reset":
            qas = {path: [] for path, _ in models}
            image = None
            continue
        if q.startswith("/image"):
            path = q.split(None, 1)[1] if len(q.split()) > 1 else ""
            image = _load_image(path, models[0][1])
            print(f"(image attached: {path})")
            continue
        for path, model in models:
            conv = default_conversation()
            conv.load_qas(qas[path] + [[q, None]])
            label = f"[{path}] " if len(models) > 1 else ""
            print(f"{label}assistant: ", end="", flush=True)
            ans = _answer(model, conv.get_prompt(), image, args,
                          stops=(conv.response_end_signal,))
            qas[path].append([q, ans])
        image = None  # images attach to one turn, like the reference demo


if __name__ == "__main__":
    main(get_args_parser().parse_args())
