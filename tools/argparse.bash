#!/usr/bin/env bash
# Minimal shell<->python argparse bridge: evaluates python argparse over
# "$@" and exports the parsed names as shell variables. Usage:
#   source tools/argparse.bash
#   argparse "$@" <<'PYEOF'
#   parser.add_argument('config')
#   parser.add_argument('--gpus', type=int, default=1)
#   PYEOF
#   echo "$CONFIG" "$GPUS"
argparse() {
    local spec
    spec=$(cat)
    eval "$(python - "$@" <<PYEOF
import argparse, shlex, sys
parser = argparse.ArgumentParser()
${spec}
args = parser.parse_args()
for name, value in vars(args).items():
    print(f'{name.upper()}={shlex.quote(str(value))}')
PYEOF
)"
}
