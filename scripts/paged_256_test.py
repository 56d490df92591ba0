"""VERDICT r2 item 6: test the paged-KV '256-token pages at T>=4096' hypothesis.

PARITY.md's r2 measurement showed the 64-token-page kernel losing at every operating
point (DMA-latency-bound). The untested counter-hypothesis: larger pages (256+) with
fewer DMAs per row could win where capacity binds (T >= 4096, high slot counts).
This measures the 36-layer decode-attention step equivalent, readback-timed via
scan-length slopes (the only reliable method through the axon tunnel), for:
  - slot-contiguous XLA decode attention over full (B, Hkv, T, D)
  - paged kernel at page_size 64 / 256 / 512
at (B=32, T=4096, 30% live) and (B=64, T=4096, 30% live).

Run: python scripts/paged_256_test.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from zoomearth_tpu.ops.attention import decode_attention
from zoomearth_tpu.ops.paged_attention import paged_decode_attention


def timed_slope(mk, n1=25, n2=150):
    def t(n):
        r = mk(n)
        out = r()
        _ = np.asarray(out)
        best = 1e9
        for _i in range(2):
            t0 = time.time()
            _ = np.asarray(r())
            best = min(best, time.time() - t0)
        return best
    a, b = t(n1), t(n2)
    return (b - a) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    Hkv, D = 2, 128
    for B, T, live_frac in [(32, 4096, 0.3), (64, 4096, 0.3)]:
        lens = jnp.asarray((rng.random(B) * 0.2 + (live_frac - 0.1)) * T, jnp.int32)
        q = jnp.asarray(rng.standard_normal((B, 1, 16, D)), jnp.bfloat16)

        # contiguous
        k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.bfloat16)

        def mk_contig(n):
            def run(k, v, lens, q):
                def body(carry, _):
                    o = decode_attention(carry, k, v, kv_len=lens)
                    return carry + 0.0 * o, o.reshape(-1)[0].astype(jnp.float32)
                _, outs = jax.lax.scan(body, q, None, length=n)
                return outs
            jr = jax.jit(run)
            return lambda: jr(k, v, lens, q)

        s = timed_slope(mk_contig)
        print(f"B={B} T={T} {int(live_frac*100)}% live | contiguous: "
              f"{s*36*1e3:.2f} ms/36-layer-step", flush=True)

        for page in (64, 256):
            max_pages = T // page
            P = B * max_pages
            kpool = jnp.asarray(rng.standard_normal((P, Hkv, page, D)), jnp.bfloat16)
            vpool = jnp.asarray(rng.standard_normal((P, Hkv, page, D)), jnp.bfloat16)
            bt = jnp.asarray(np.arange(P).reshape(B, max_pages), jnp.int32)
            q3 = q[:, 0]

            def mk_paged(n, page=page, kpool=kpool, vpool=vpool, bt=bt):
                # pools passed as ARGS: closure capture embeds them as constants in
                # the compile payload (HTTP 413 over the remote-compile tunnel)
                def run(kpool, vpool, bt, lens, q3):
                    def body(carry, _):
                        o = paged_decode_attention(carry, kpool, vpool, bt, lens, page_size=page)
                        return carry + 0.0 * o, o.reshape(-1)[0].astype(jnp.float32)
                    _, outs = jax.lax.scan(body, q3, None, length=n)
                    return outs
                jr = jax.jit(run)
                return lambda: jr(kpool, vpool, bt, lens, q3)

            s = timed_slope(mk_paged)
            print(f"B={B} T={T} {int(live_frac*100)}% live | paged[{page}]: "
                  f"{s*36*1e3:.2f} ms/36-layer-step", flush=True)


if __name__ == "__main__":
    main()
