#!/bin/sh
# Post-training search-statistics chain (host CPU, native engine).
cd /root/repo
nice -n 10 python scripts/eval_native.py n7deep --num 600 --depth 3 --width 4 --seed 7 --threads 2 > scripts/r5_native_n7_d3w4.txt 2>&1
nice -n 10 python scripts/eval_native.py n7deep --num 400 --depth 3 --width 8 --seed 7 --threads 2 > scripts/r5_native_n7_d3w8.txt 2>&1
nice -n 10 python scripts/eval_native.py n6canon --num 400 --depth 3 --width 8 --seed 7 --threads 2 > scripts/r5_native_n6_d3w8.txt 2>&1
nice -n 10 python scripts/eval_native.py n7deep --num 150 --depth 4 --width 4 --seed 7 --threads 2 > scripts/r5_native_n7_d4w4.txt 2>&1
nice -n 10 python scripts/eval_native.py n6canon --num 100 --depth 4 --width 4 --seed 7 --threads 2 > scripts/r5_native_n6_d4w4.txt 2>&1
echo CHAIN DONE
