import sys, subprocess
# run chain-1 and chain-9 in SEPARATE processes (readback wedges a session)
for n in (1, 9):
    cmd = ["python", "tools/frame_bench5.py"] + sys.argv[1:]
    import os
    env = dict(os.environ); env["CHAIN_N"] = str(n)
    subprocess.run(cmd, env=env)
