"""Stream CSPRNG bytes to stdout — the `generate_random` binary analog
(concrete-csprng/src/generate_random.rs:8).

Usage: python -m concrete_tpu.csprng [n_bytes] [--seed SEED]
"""

import sys

from .generator import AesCtrGenerator


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    seed = None
    for a in sys.argv[1:]:
        if a.startswith("--seed"):
            seed = int(a.split("=", 1)[1])
    total = int(args[0]) if args else None
    gen = AesCtrGenerator(key=seed)
    chunk = 1 << 16
    written = 0
    out = sys.stdout.buffer
    while total is None or written < total:
        n = chunk if total is None else min(chunk, total - written)
        out.write(gen.generate_bytes(n).tobytes())
        written += n


if __name__ == "__main__":
    main()
