#!/usr/bin/env python
"""Root entry point: ``python train.py ...`` like the reference repo.

Thin shim over :mod:`eo_diffusion_tpu.cli.train` (same flag surface as the
reference train.py plus preset/dataset selection).
"""

from eo_diffusion_tpu.cli.train import main, parse_args

if __name__ == "__main__":
    main(parse_args())
