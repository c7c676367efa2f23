#!/bin/bash
# Run a TPU job with claim-hang protection: retry up to $RETRIES times,
# each attempt killed after $ATTEMPT_TIMEOUT s. Logs to stdout.
RETRIES=${RETRIES:-6}
ATTEMPT_TIMEOUT=${ATTEMPT_TIMEOUT:-1800}
for i in $(seq 1 $RETRIES); do
  echo "=== attempt $i/$RETRIES $(date) ==="
  PYTHONPATH=/root/.axon_site:/root/repo timeout $ATTEMPT_TIMEOUT python -u "$@"
  rc=$?
  [ $rc -eq 0 ] && echo "=== success $(date) ===" && exit 0
  echo "=== attempt $i failed rc=$rc $(date) ==="
  sleep 60
done
echo "=== ALL ATTEMPTS FAILED $(date) ==="
exit 1
