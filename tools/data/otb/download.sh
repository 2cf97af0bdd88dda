#!/usr/bin/env bash
# Download OTB-100 sequences into data/otb (reference tools/data/otb).
DATA_DIR=${1:-data/otb}
mkdir -p "${DATA_DIR}"
cd "${DATA_DIR}"
BASE=http://cvlab.hanyang.ac.kr/tracker_benchmark/seq
# sequence list from the OTB-2015 benchmark
for seq in Basketball Biker Bird1 Bird2 BlurBody BlurCar1 BlurCar2 BlurCar3 \
    BlurCar4 BlurFace BlurOwl Board Bolt Bolt2 Box Boy Car1 Car2 Car24 Car4 \
    CarDark CarScale ClifBar Coke Couple Coupon Crossing Crowds Dancer \
    Dancer2 David David2 David3 Deer Diving Dog Dog1 Doll DragonBaby Dudek \
    FaceOcc1 FaceOcc2 Fish FleetFace Football Football1 Freeman1 Freeman3 \
    Freeman4 Girl Girl2 Gym Human2 Human3 Human4 Human5 Human6 Human7 \
    Human8 Human9 Ironman Jogging Jump Jumping KiteSurf Lemming Liquor Man \
    Matrix Mhyang MotorRolling MountainBike Panda RedTeam Rubik Shaking \
    Singer1 Singer2 Skater Skater2 Skating1 Skating2 Skiing Soccer Subway \
    Surfer Suv Sylvester Tiger1 Tiger2 Toy Trans Trellis Twinnings Vase \
    Walking Walking2 Woman; do
  wget -c "${BASE}/${seq}.zip" && unzip -qo "${seq}.zip" && rm "${seq}.zip"
done
