"""HTTP serving demo (stdlib; gradio-free).

Endpoints:
  POST /generate        {"prompts": [...], "max_gen_len", "temperature",
                         "top_p", "stop"} → {"outputs": [...]}
  POST /chat            {"qas": [[q, a], ..., [q, null]]} → {"response": ...}
  POST /stream_generate {"prompt": ...} → text/event-stream of {"text", ...}
  GET  /health          → {"status": "ok"}

Reference counterpart: accessory/demos/single_turn.py / multi_turn.py
(gradio servers with request queues + worker broadcast, :88-164 / :28-120).
A threading lock serializes device access (the reference serializes through
its request queue the same way).

Run: python -m accessory_tpu.demos.server --pretrained_path ckpt/ --port 8080
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


def get_args_parser():
    p = argparse.ArgumentParser("serving demo", add_help=False)
    p.add_argument("--pretrained_path", required=True, type=str)
    p.add_argument("--llama_type", default=None, type=str)
    p.add_argument("--max_seq_len", default=2048, type=int)
    p.add_argument("--quant", action="store_true")
    p.add_argument("--quant_bits", default=4, type=int, choices=(3, 4, 8))
    p.add_argument("--kv_dtype", default=None, choices=(None, "int8"),
                   help="int8: quantized KV cache (2x context per GB)")
    p.add_argument("--host", default="127.0.0.1", type=str)
    p.add_argument("--port", default=8080, type=int)
    return p


def make_handler(model, lock: threading.Lock):
    from accessory_tpu.data.conversation import default_conversation

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except Exception as e:
                return self._json(400, {"error": str(e)})

            if self.path == "/generate":
                with lock:
                    outs = model.generate(
                        req["prompts"],
                        max_gen_len=req.get("max_gen_len", 256),
                        temperature=req.get("temperature", 0.0),
                        top_p=req.get("top_p", 0.95),
                        additional_stop_symbols=tuple(req.get("stop", [])))
                return self._json(200, {"outputs": outs})

            if self.path == "/chat":
                conv = default_conversation()
                conv.load_qas(req["qas"])
                prompt = conv.get_prompt()
                with lock:
                    out = model.generate(
                        [prompt], max_gen_len=req.get("max_gen_len", 256),
                        temperature=req.get("temperature", 0.0),
                        additional_stop_symbols=(conv.response_end_signal,))[0]
                end = conv.response_end_signal
                if end and end in out:
                    out = out[: out.index(end)]
                return self._json(200, {"response": out.strip()})

            if self.path == "/stream_generate":
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.end_headers()
                with lock:
                    for chunk in model.stream_generate(
                            req["prompt"],
                            max_gen_len=req.get("max_gen_len", 256),
                            temperature=req.get("temperature", 0.0)):
                        self.wfile.write(
                            f"data: {json.dumps(chunk)}\n\n".encode())
                        self.wfile.flush()
                return

            self._json(404, {"error": "not found"})

        def log_message(self, *a):  # quiet
            pass

    return Handler


def serve(model, host: str = "127.0.0.1", port: int = 8080):
    lock = threading.Lock()
    server = ThreadingHTTPServer((host, port), make_handler(model, lock))
    print(f"serving on http://{host}:{port}")
    return server


def main(args) -> None:
    from accessory_tpu.meta import MetaModel

    model = MetaModel.from_pretrained(
        args.pretrained_path, llama_type=args.llama_type,
        max_seq_len=args.max_seq_len, quant=args.quant,
        quant_bits=args.quant_bits, kv_dtype=args.kv_dtype)
    serve(model, args.host, args.port).serve_forever()


if __name__ == "__main__":
    main(get_args_parser().parse_args())
