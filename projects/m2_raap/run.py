import sys

from antmmf_tpu.run import main

if __name__ == "__main__":
    main(sys.argv[1:])
