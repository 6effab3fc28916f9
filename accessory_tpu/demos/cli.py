"""Interactive terminal chat demo.

Reference: accessory/demos/single_model_cli.py / multi_model_cli.py. Streams
tokens as they decode; multi-turn context via the conversation template.

Run: python -m accessory_tpu.demos.cli --pretrained_path ckpt/
"""

from __future__ import annotations

import argparse


def get_args_parser():
    p = argparse.ArgumentParser("cli demo", add_help=False)
    p.add_argument("--pretrained_path", required=True, type=str)
    p.add_argument("--llama_type", default=None, type=str)
    p.add_argument("--max_seq_len", default=2048, type=int)
    p.add_argument("--max_gen_len", default=256, type=int)
    p.add_argument("--temperature", default=0.1, type=float)
    p.add_argument("--top_p", default=0.75, type=float)
    p.add_argument("--quant", action="store_true")
    return p


def main(args) -> None:
    from accessory_tpu.data.conversation import default_conversation
    from accessory_tpu.meta import MetaModel

    model = MetaModel.from_pretrained(
        args.pretrained_path, llama_type=args.llama_type,
        max_seq_len=args.max_seq_len, quant=args.quant)
    qas = []
    print("(empty line to quit; '/reset' to clear history)")
    while True:
        try:
            q = input("user: ").strip()
        except EOFError:
            break
        if not q:
            break
        if q == "/reset":
            qas = []
            continue
        conv = default_conversation()
        conv.load_qas(qas + [[q, None]])
        shown = ""
        print("assistant: ", end="", flush=True)
        for chunk in model.stream_generate(
                conv.get_prompt(), max_gen_len=args.max_gen_len,
                temperature=args.temperature, top_p=args.top_p,
                additional_stop_symbols=(conv.response_end_signal,)):
            text = chunk["text"]
            print(text[len(shown):], end="", flush=True)
            shown = text
            if chunk["end_of_content"]:
                break
        print()
        qas.append([q, shown])


if __name__ == "__main__":
    main(get_args_parser().parse_args())
