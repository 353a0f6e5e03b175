"""base_vtp entry: UniVL-style video/image-text pretraining + retrieval.

Mirrors /root/reference/prj/base_vtp/run.py (antmmf.run.plain_run after
registry imports). All models/datasets are framework-builtin here, so no
project package import is needed.
"""
import sys

from antmmf_tpu.run import main

if __name__ == "__main__":
    main(sys.argv[1:])
