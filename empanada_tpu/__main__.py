"""``python -m empanada_tpu`` == ``python -m empanada_tpu.cli``."""

from empanada_tpu.cli import main

if __name__ == "__main__":
    main()
