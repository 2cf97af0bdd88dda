#!/usr/bin/env bash
# Kinetics-400 videos: follow the ActivityNet crawler like the reference
# (tools/data/kinetics400). Expects youtube-dl/yt-dlp credentials & quota.
echo "Kinetics-400 must be crawled from YouTube or obtained from the "
echo "CVDF mirror; place videos under data/kinetics400/videos_train and "
echo "generate kinetics400_train_list_videos.txt (path label per line)."
