#!/usr/bin/env python
"""Root entry point: ``python inference.py ...`` like the reference repo.

Thin shim over :mod:`eo_diffusion_tpu.cli.inference`.
"""

from eo_diffusion_tpu.cli.inference import main, parse_args

if __name__ == "__main__":
    main(parse_args())
