import sys
sys.path.insert(0, '/root/repo')
exec(open('scratch/t_defaults.py').read().split('run("lz4')[0])
run("lz4  fullK  n64  mt1024", 64, "lz4", 0, 1024)
run("lz4  fullK  n256 mt1024", 256, "lz4", 0, 1024)
