"""Run BASELINE benchmark configs: python -m benchmarks.run [1|2|3|4|5|all]"""
import json
import sys


def main():
    from benchmarks.configs import CONFIGS
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    keys = list(CONFIGS) if which == "all" else [which]
    for k in keys:
        result = CONFIGS[k]()
        # flush: on the tunneled TPU runtime process exit can hang for
        # minutes on teardown; an outer `timeout` must not lose the result
        print(json.dumps({"config_id": k, **result}), flush=True)


if __name__ == "__main__":
    main()
