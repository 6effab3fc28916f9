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
    # continuous-batching engine (vLLM-style serving; see engine/scheduler)
    p.add_argument("--continuous", action="store_true",
                   help="route /generate through the continuous batcher")
    p.add_argument("--slots", default=8, type=int)
    p.add_argument("--decode_steps", default=1, type=int)
    p.add_argument("--prefill_chunk", default=None, type=int)
    p.add_argument("--prefix_cache", action="store_true",
                   help="automatic prompt caching across requests")
    p.add_argument("--spec_lookup", default=0, type=int,
                   help="K>0: prompt-lookup speculative decoding (greedy)")
    return p


class BatchedEngine:
    """Background continuous-batching loop for the HTTP server.

    Owns a ContinuousBatcher on a daemon thread: handlers submit requests
    from any connection thread and block on per-request completion events,
    while the loop keeps ALL in-flight requests advancing together
    (admission between decode steps, paged KV sharing, optional prefix
    cache). This is the production-serving counterpart of the lock-per-
    call Generator path — concurrent clients batch onto the chip instead
    of queueing behind each other.

    Reference role: the worker/request-queue loop of
    accessory/model/multi_gpu_wrapper.py:143-321 and demos/multi_turn.py
    :28-120, rebuilt around continuous batching."""

    def __init__(self, batcher):
        self.b = batcher
        self.lock = threading.Lock()
        self._events: dict = {}
        self._results: dict = {}
        self._wake = threading.Event()
        threading.Thread(target=self._loop, daemon=True).start()

    def submit(self, prompt: str, max_gen_len: int, temperature: float,
               top_p: float):
        with self.lock:
            uid = self.b.add_request(prompt, max_gen_len, temperature, top_p)
            ev = threading.Event()
            self._events[uid] = ev
        self._wake.set()
        return uid, ev

    def generate(self, prompts, max_gen_len=256, temperature=0.0,
                 top_p=0.95):
        subs = [self.submit(p, max_gen_len, temperature, top_p)
                for p in prompts]
        for _, ev in subs:
            ev.wait()
        with self.lock:
            return [self._results.pop(uid) for uid, _ in subs]

    def _loop(self):
        while True:
            with self.lock:
                busy = bool(self.b.pending) or any(
                    r is not None for r in self.b.active.values())
                if busy:
                    for req in self.b.step():
                        self._results[req.uid] = self.b.tokenizer.decode(
                            req.output_tokens)
                        ev = self._events.pop(req.uid, None)
                        if ev:
                            ev.set()
            if not busy:
                self._wake.wait(timeout=0.05)
                self._wake.clear()


_CHAT_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>accessory_tpu chat</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:780px;margin:2rem auto;
      padding:0 1rem;background:#fafafa;color:#222}
 #log{border:1px solid #ddd;background:#fff;border-radius:8px;
      padding:1rem;min-height:320px;max-height:60vh;overflow-y:auto}
 .u{color:#0b5394;margin:.5rem 0 0}.a{color:#222;white-space:pre-wrap;
      margin:.25rem 0 .75rem}
 form{display:flex;gap:.5rem;margin-top:1rem}
 input[type=text]{flex:1;padding:.6rem;border:1px solid #ccc;
      border-radius:6px}
 button{padding:.6rem 1.2rem;border:0;border-radius:6px;
      background:#0b5394;color:#fff;cursor:pointer}
 .opts{margin-top:.5rem;font-size:.85rem;color:#666}
 .opts input{width:5rem}
</style></head><body>
<h2>accessory_tpu</h2>
<div id="log"></div>
<form id="f"><input type="text" id="q" placeholder="Say something..."
 autofocus><button>Send</button></form>
<div class="opts">max_gen_len <input id="mgl" value="256">
 temperature <input id="temp" value="0.0">
 <label><input type="checkbox" id="stream"> stream (single-turn)</label>
 <button type="button" id="clear">clear</button></div>
<script>
const log=document.getElementById('log'),f=document.getElementById('f'),
      q=document.getElementById('q');let qas=[];
function add(cls,text){const d=document.createElement('div');
  d.className=cls;d.textContent=text;log.appendChild(d);
  log.scrollTop=log.scrollHeight;return d;}
document.getElementById('clear').onclick=()=>{qas=[];log.innerHTML='';};
f.onsubmit=async e=>{e.preventDefault();const msg=q.value.trim();
 if(!msg)return;q.value='';add('u','> '+msg);
 const mgl=+document.getElementById('mgl').value||256,
       temp=+document.getElementById('temp').value||0;
 if(document.getElementById('stream').checked){
   const d=add('a','');
   const r=await fetch('/stream_generate',{method:'POST',
     body:JSON.stringify({prompt:msg,max_gen_len:mgl,temperature:temp})});
   const rd=r.body.getReader(),dec=new TextDecoder();let buf='';
   for(;;){const{done,value}=await rd.read();if(done)break;
     buf+=dec.decode(value,{stream:true});
     for(const line of buf.split('\\n\\n')){if(!line.startsWith('data: '))
       continue;try{const c=JSON.parse(line.slice(6));
       if(c.end_of_content)d.textContent=c.text;
       else d.textContent+=c.text;}catch(_){}}
     buf=buf.slice(buf.lastIndexOf('\\n\\n')+2);}
 }else{
   qas.push([msg,null]);const d=add('a','...');
   const r=await fetch('/chat',{method:'POST',
     body:JSON.stringify({qas:qas,max_gen_len:mgl,temperature:temp})});
   const j=await r.json();d.textContent=j.response||j.error;
   qas[qas.length-1][1]=j.response;}
};
</script></body></html>"""


def make_handler(model, lock: threading.Lock, engine=None):
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
            elif self.path in ("/", "/index.html"):
                # single-file chat UI — the reference's gradio web demo
                # role (accessory/demos/single_turn.py etc.) without the
                # gradio dependency: multi-turn /chat plus token streaming
                # via /stream_generate
                body = _CHAT_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except Exception as e:
                return self._json(400, {"error": str(e)})

            if self.path == "/generate":
                if engine is not None and not req.get("stop"):
                    # continuous-batching path: concurrent requests batch
                    # onto the chip (stop-symbol requests take the
                    # Generator, whose stop matching is per-call)
                    outs = engine.generate(
                        req["prompts"],
                        max_gen_len=req.get("max_gen_len", 256),
                        temperature=req.get("temperature", 0.0),
                        top_p=req.get("top_p", 0.95))
                    return self._json(200, {"outputs": outs})
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


def serve(model, host: str = "127.0.0.1", port: int = 8080,
          continuous: bool = False, **batcher_kw):
    lock = threading.Lock()
    engine = None
    if continuous:
        from accessory_tpu.engine.scheduler import ContinuousBatcher

        engine = BatchedEngine(ContinuousBatcher(
            model.module, model.args, model.params, model.tokenizer,
            **batcher_kw))
    server = ThreadingHTTPServer((host, port),
                                 make_handler(model, lock, engine))
    print(f"serving on http://{host}:{port}"
          + (" (continuous batching)" if continuous else ""))
    return server


def main(args) -> None:
    from accessory_tpu.meta import MetaModel

    model = MetaModel.from_pretrained(
        args.pretrained_path, llama_type=args.llama_type,
        max_seq_len=args.max_seq_len, quant=args.quant,
        quant_bits=args.quant_bits, kv_dtype=args.kv_dtype)
    kw = {}
    if args.continuous:
        kw = dict(continuous=True, slots=args.slots,
                  decode_steps=args.decode_steps,
                  prefill_chunk=args.prefill_chunk,
                  prefix_cache=args.prefix_cache,
                  spec_lookup=args.spec_lookup,
                  kv_dtype=args.kv_dtype)
    serve(model, args.host, args.port, **kw).serve_forever()


if __name__ == "__main__":
    main(get_args_parser().parse_args())
